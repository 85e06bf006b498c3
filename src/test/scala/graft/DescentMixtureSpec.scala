package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 widening batch: NN-descent
  * refinement (v29), lexical diversity (t14), mixture weights (p2),
  * frame sampling (m5), daily top-k spenders (e12), sliding-window
  * DAU (e13). Exact value parity is covered by the DuckDB oracle gate;
  * these assert the semantic properties the oracle can't name.
  */
class DescentMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("v29: refinement never worsens any rank-1 neighbor vs v28") {
    val before = Queries.v28KnnGraph(spark, sf)
      .filter($"rnk" === 1).select($"src_id", $"dist".as("d0"))
    val after = Queries.v29NnDescent(spark, sf)
      .filter($"rnk" === 1).select($"src_id", $"dist".as("d1"))
    val joined = before.join(after, "src_id")
      .select($"src_id", $"d0", $"d1").collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-12,
        s"src ${r.getLong(0)} got worse"))
    // descent output is still a valid ranked graph
    val g = Queries.v29NnDescent(spark, sf).collect()
    assert(g.forall(r => r.getAs[Long]("rnk") >= 1 &&
      r.getAs[Long]("rnk") <= 3))
    assert(g.forall(r => r.getAs[Long]("src_id") != r.getAs[Long]("dst_id")))
  }

  test("t14: doc-0 replay matches, hapax <= types <= tokens") {
    val rows = Queries.t14Hapax(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" === 0).select("text").as[String].head()
    val freq = text.split(" ", -1).groupBy(identity).map(_._2.length)
    val r0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(r0.getAs[Long]("n_tokens") === freq.sum.toLong)
    assert(r0.getAs[Long]("n_types") === freq.size.toLong)
    assert(r0.getAs[Long]("n_hapax") === freq.count(_ == 1).toLong)
  }

  test("p2: shares sum to 1, masses reconcile with the corpus") {
    val rows = Queries.p2MixtureWeights(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val nTok = docs.select(sum(size(split($"text", " ")).cast("long")))
      .as[Long].head()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === nTok)
    val share = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
  }

  test("m5: frame manifest is the exact 250 ms grid per asset") {
    val byAsset = Queries.m5FrameSample(spark, sf).collect()
      .groupBy(_.getAs[Long]("asset_id"))
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (_, frames) =>
      val dur = frames.head.getAs[Long]("duration_ms")
      val offs = frames.sortBy(_.getAs[Long]("frame_idx"))
        .map(_.getAs[Long]("offset_ms")).toSeq
      assert(offs === (0L to dur by 250L).toSeq)
      assert(frames.forall(f =>
        f.getAs[Long]("offset_ms") === f.getAs[Long]("frame_idx") * 250L))
    }
  }

  test("e12: per-day ranks are dense, spend non-increasing, ties by id") {
    val byDay = Queries.e12TopSpenders(spark, sf).collect()
      .groupBy(_.getAs[Long]("day_epoch"))
    assert(byDay.nonEmpty)
    byDay.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("spend"), b.getAs[Double]("spend"))
          assert(sa > sb ||
            (sa == sb &&
              a.getAs[Long]("user_id") < b.getAs[Long]("user_id")))
        case _ => ()
      }
    }
  }

  test("v30: mutual edges land in one cluster; labels are component minima") {
    val labels = Queries.v30MutualKnnClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"))).toMap
    // every vector is labeled, label <= own id (min-propagation)
    assert(labels.size === 500)
    labels.foreach { case (id, (cid, _)) => assert(cid <= id) }
    // endpoints of every mutual v28 edge share a cluster
    val g = Queries.v28KnnGraph(spark, sf)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    val mutual = g.filter { case (a, b) => a < b && g.contains((b, a)) }
    assert(mutual.nonEmpty)
    mutual.foreach { case (a, b) =>
      assert(labels(a)._1 === labels(b)._1, s"edge ($a,$b) split") }
    // n_members is the exact label multiplicity
    val sizes = labels.values.groupBy(_._1).map { case (c, v) => c -> v.size }
    labels.foreach { case (_, (cid, n)) => assert(n === sizes(cid)) }
  }

  test("q22: one winner per nation with the true max balance") {
    val rows = Queries.q22TopBalance(spark, sf).collect()
    assert(rows.map(_.getAs[String]("n_name")).distinct.length === rows.length)
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_nationkey".cast("long"), $"c_custkey".cast("long"),
        round($"c_acctbal" * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_nationkey".cast("long"), $"n_name")
      .as[(Long, String)].collect().toMap
    val best = c.groupBy(_._1).map { case (nk, rs) =>
      val w = rs.maxBy(r => (r._3, r._2)); nation(nk) -> w }
    rows.foreach { r =>
      val w = best(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("c_custkey") === w._2)
      assert(r.getAs[Double]("acctbal") === w._3 / 100.0)
    }
  }

  test("e14: user-0 replay matches mean and exact variance") {
    val rows = Queries.e14Cadence(spark, sf).collect()
    val us = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" === 0)
      .select(expr("ts div 1000").as("us"), $"event_id".cast("long"))
      .as[(Long, Long)].collect().sortBy(identity).map(_._1)
    val gaps = us.sliding(2).map(a => BigInt(a(1) - a(0))).toSeq
    val (n, sg, sg2) = (gaps.size, gaps.sum, gaps.map(g => g * g).sum)
    val r0 = rows.find(_.getAs[Long]("user_id") == 0L).get
    assert(r0.getAs[Long]("n_gaps") === n.toLong)
    assert(r0.getAs[Double]("mean_gap_us") ===
      sg.toDouble / n)
    assert(r0.getAs[Double]("var_gap") ===
      (BigInt(n) * sg2 - sg * sg).toDouble / (n.toLong * (n - 1)))
  }

  test("v31: signed permutation is an exact isometry; output well-formed") {
    import graft.functions.VectorFunctions._
    val (perm, signs) = signedPerm(64, seed = 42L)
    assert(perm.sorted.toSeq === (0 until 64))
    assert(signs.forall(s => s == 1 || s == -1))
    // rotating both vectors leaves the exact integer L2 unchanged
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .select($"vec_id".cast("long").as("id"),
        quantize($"embedding").as("qv"))
    val r = e.select($"id", applySignedPerm($"qv", perm, signs).as("rv"),
      $"qv")
    val pairs = r.as("a").crossJoin(r.as("b"))
      .filter($"a.id" < $"b.id")
      .select(intL2Sq($"a.qv", $"b.qv").as("d0"),
        intL2Sq($"a.rv", $"b.rv").as("d1"))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (d0, d1) => assert(d0 === d1) }
    // the gated query itself: 5 ranked hits per query vector
    val out = Queries.v31OpqPrerotate(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, hits) =>
      assert(hits.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to 5L)) }
  }

  test("e15: transition mass = events minus one per user") {
    val rows = Queries.e15Transitions(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val nUsers = ev.select(countDistinct($"user_id")).as[Long].head()
    assert(rows.map(_.getAs[Long]("n")).sum === ev.count() - nUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") >= 1)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n"))
    }
  }

  test("p3: funnel is monotone and lands on p1's representative count") {
    val r = Queries.p3CleanFunnel(spark, sf).collect()
    assert(r.length === 1)
    val f = r.head
    val seqd = Seq("n_total", "n_lang", "n_quality", "n_exact", "n_final")
      .map(f.getAs[Long](_))
    assert(seqd === seqd.sorted.reverse)
    assert(seqd.head ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    assert(seqd.last === Queries.p1CorpusClean(spark, sf).count())
  }

  test("e13: every event lands in exactly 3 windows; dau bounded") {
    val rows = Queries.e13SlidingDau(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
    assert(rows.map(_.getAs[Long]("n_events")).sum === 3 * ev.count())
    val users = ev.select(countDistinct($"user_id")).as[Long].head()
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") >= 1 && r.getAs[Long]("dau") <= users)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("n_events"))
    }
  }
}

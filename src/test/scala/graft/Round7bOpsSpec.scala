package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-7b batch: OPQ recall (v69), the
  * retrain migration matrix (v70), session path mining (e33), and
  * feature-space asset near-dup (m14). Exact value parity is covered
  * by the DuckDB oracle gate; these assert the semantic properties the
  * oracle can't name.
  */
class Round7bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("v69: one row per query, 0 <= n_hit <= 5, recall = n_hit/5, " +
    "and n_hit replays exactly from the gated v31/v1 results") {
    val out = Queries.v69OpqRecall(spark, sf).collect()
    val nQ = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    assert(out.length == nQ)
    out.foreach { r =>
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 5)
      assert(r.getAs[Double]("recall_at_5") == h / 5.0)
    }
    val exact = Queries.v1KnnL2(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Queries.v31OpqPrerotate(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_hit") ==
        (exact(q) intersect approx(q)).size.toLong)
    }
  }

  test("v70: the flow matrix partitions the gallery (sum n = N), both " +
    "axes are seed-centroid ids, and the seed marginal equals v6's " +
    "gated occupancy") {
    val out = Queries.v70AssignDrift(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    out.foreach { r =>
      assert((0L to 9L).contains(r.getAs[Long]("seed_cid")))
      assert((0L to 9L).contains(r.getAs[Long]("trained_cid")))
    }
    val seedMarginal = out.groupBy(_.getAs[Long]("seed_cid"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val v6 = Queries.v6IvfAssign(spark, sf).collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getAs[Long]("n")).toMap
    assert(seedMarginal == v6)
  }

  test("e33: trigram totals replay exactly from a driver-side pass " +
    "over the (tiny) test events, and n_users <= n per path") {
    val out = Queries.e33SessionPaths(spark, sf).collect()
      .map(r => (r.getAs[String]("p1"), r.getAs[String]("p2"),
        r.getAs[String]("p3")) -> (r.getAs[Long]("n"),
        r.getAs[Long]("n_users"))).toMap
    out.values.foreach { case (n, u) => assert(u >= 1 && u <= n) }
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id".cast("long"), $"event_id".cast("long"),
        $"ts".cast("long"), $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Math.floorDiv(r.getLong(2), 1000L), r.getString(3)))
    val replay = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3, r._2)).toList
      s.sliding(3).filter(_.size == 3).collect {
        case a :: b :: c :: Nil
          if b._3 - a._3 <= 1800000000L && c._3 - b._3 <= 1800000000L =>
          (a._4, b._4, c._4)
      }
    }.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(out.view.mapValues(_._1).toMap == replay)
  }

  test("v71: list occupancies partition the gallery, dead counts " +
    "match the v62 tombstone set per list, and the rewrite flag is " +
    "exactly the 12.5% cross-multiply") {
    val out = Queries.v71CompactionReport(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n_total")).sum == n)
    val nDead = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 7 === 0).count()
    assert(out.map(_.getAs[Long]("n_dead")).sum == nDead)
    out.foreach { r =>
      val total = r.getAs[Long]("n_total"); val dead = r.getAs[Long]("n_dead")
      assert(r.getAs[Long]("n_live") == total - dead)
      assert(r.getAs[Double]("dead_frac") == dead.toDouble / total)
      assert(r.getAs[Long]("needs_compaction") ==
        (if (dead * 8 > total) 1L else 0L))
    }
  }

  test("p9: card totals reconcile with the gated t1/t2/t3 chains and " +
    "d1's duplicate-group mass") {
    val card = Queries.p9SourceDataCard(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(card.values.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val t1 = Queries.t1LangId(spark, sf).collect()
    val en = t1.count(_.getAs[Double]("stop_ratio") >= 0.1)
    assert(card.values.map(r =>
      math.round(r.getAs[Double]("en_share") *
        r.getAs[Long]("n_docs"))).sum == en)
    val tokTotal = Queries.t3TokenCount(spark, sf).collect()
      .map(_.getAs[Long]("ws_tokens")).sum
    assert(card.values.map(_.getAs[Long]("n_tokens")).sum == tokTotal)
    // exact-dup mass: Σ per-source (n_docs − distinct hashes) equals a
    // direct per-source distinct count
    import org.apache.spark.sql.functions.{col, countDistinct, md5 => smd5}
    val dd = docs.groupBy("source")
      .agg((org.apache.spark.sql.functions.count(col("doc_id"))
        - countDistinct(smd5(col("text")))).as("dups"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("dups"))
      .toMap
    card.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_exact_dups") == dd(src))
    }
  }

  test("m14: pairs are ordered (a<b) within the verify radius, a " +
    "sampled pair's d2 replays from scratch, and no over-cap cell " +
    "contributes a pair (the guard binds)") {
    val out = Queries.m14AssetNeardup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val d2 = r.getAs[Long]("d2")
      assert(d2 <= 250000L)
      assert(r.getAs[Double]("dist") == math.sqrt(d2.toDouble) / 100.0)
    }
    // driver-side replay of the full chain on the tiny test corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def qf(t: String): Array[Long] = {
      val bytes = t.getBytes("UTF-8")
      val acc = new Array[Double](8); val cnt = new Array[Long](8)
      bytes.zipWithIndex.foreach { case (b, i) =>
        acc(i % 8) += (b & 0xff); cnt(i % 8) += 1 }
      (0 until 8).map(d => math.round(acc(d) / cnt(d) * 100)).toArray
    }
    val feats = docs.map { case (id, t) => id -> qf(t) }.toMap
    val buckets = feats.toSeq
      .groupBy { case (_, f) => f.map(x => x / 1000).mkString(":") }
    val expected = buckets.values.filter(_.size <= 64).flatMap { cell =>
      for {
        (a, fa) <- cell; (b, fb) <- cell if a < b
        d2 = fa.zip(fb).map { case (x, y) => (x - y) * (x - y) }.sum
        if d2 <= 250000L
      } yield (math.min(a, b), math.max(a, b)) -> d2
    }.toMap
    val got = out.map(r => (r.getAs[Long]("a_id"),
      r.getAs[Long]("b_id")) -> r.getAs[Long]("d2")).toMap
    assert(got == expected)
  }

  test("v72: 5 ranked neighbors per novel query, distances " +
    "nondecreasing in rank, and every query's full ranking replays " +
    "from the midpoint construction driver-side") {
    val out = Queries.v72NovelQueryKnn(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("dist") <= b.getAs[Double]("dist"))
      }
    }
    // driver-side replay on the tiny corpus: quantize, build the
    // floor-midpoint novel queries, exact L2 rank with (d2, gid)
    // tie-break — must match every emitted (query, rank, neighbor).
    val scale = graft.functions.VectorFunctions.DefaultScale
    val g = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * scale)).toArray)
      .toMap
    val queries = g.keys.filter(id => id % 100 == 0 && g.contains(id + 1))
    val expected = queries.flatMap { qid =>
      val qv = g(qid).zip(g(qid + 1)).map { case (a, b) =>
        math.floor((a + b) / 2.0).toLong }
      g.toSeq.map { case (gid, gv) =>
        val d2 = gv.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum
        (d2, gid)
      }.sorted.take(5).zipWithIndex.map { case ((d2, gid), i) =>
        (qid, i + 1L, gid) -> (math.sqrt(d2.toDouble) / scale)
      }
    }.toMap
    val gotMap = out.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")) ->
      r.getAs[Double]("dist")).toMap
    assert(gotMap == expected)
  }

  test("v73: 5 distinct picks per query from the top-10 pool, pick 1 " +
    "is the exact nearest neighbor, and the full greedy MMR selection " +
    "replays driver-side") {
    val out = Queries.v73MmrDiversify(spark, sf).collect()
    val scale = graft.functions.VectorFunctions.DefaultScale
    val g = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * scale)).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = g.keys.filter(_ % 100 == 0)
    val expected = queries.flatMap { qid =>
      val pool = g.toSeq.map { case (gid, gv) => (d2(gv, g(qid)), gid) }
        .sorted.take(10).map { case (dq, gid) => (gid, dq) }
      var sel = List(pool.head)
      for (_ <- 2 to 5) {
        val pick = pool.filterNot(c => sel.exists(_._1 == c._1))
          .map { case (gid, dq) =>
            val minsel = sel.map(s => d2(g(gid), g(s._1))).min
            (minsel - dq, -gid, gid, dq)
          }.max
        sel = sel :+ (pick._3 -> pick._4)
      }
      sel.zipWithIndex.map { case ((gid, dq), i) =>
        (qid, i + 1L, gid) -> (math.sqrt(dq.toDouble) / scale) }
    }.toMap
    val gotMap = out.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id")) ->
      r.getAs[Double]("dist")).toMap
    assert(gotMap == expected)
    // diversification actually moved something: at least one query's
    // MMR set differs from its plain top-5
    val plain = queries.map { qid =>
      qid -> g.toSeq.map { case (gid, gv) => (d2(gv, g(qid)), gid) }
        .sorted.take(5).map(_._2).toSet }.toMap
    val mmrSets = out.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(mmrSets.exists { case (q, s) => s != plain(q) })
  }

  test("m15: one row per pair, mismatch = sign of the exact dot, and " +
    "dot/norms replay from the stub-feature + stride-fold construction") {
    val out = Queries.m15PairAlignment(spark, sf).collect()
    val scale = graft.functions.VectorFunctions.DefaultScale
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * scale)).toArray)
      .toMap
    val ids = docs.keySet intersect embs.keySet
    assert(out.length == ids.size)
    def qf(t: String): Array[Long] = {
      val bytes = t.getBytes("UTF-8")
      val acc = new Array[Double](8); val cnt = new Array[Long](8)
      bytes.zipWithIndex.foreach { case (b, i) =>
        acc(i % 8) += (b & 0xff); cnt(i % 8) += 1 }
      (0 until 8).map(d => math.round(acc(d) / cnt(d) * 100)).toArray
    }
    out.foreach { r =>
      val id = r.getAs[Long]("pair_id")
      val f = qf(docs(id))
      val tb = new Array[Long](8)
      embs(id).zipWithIndex.foreach { case (x, i) => tb(i % 8) += x }
      val dot = f.zip(tb).map { case (a, b) => a * b }.sum
      val a2 = f.map(x => x * x).sum
      val b2 = tb.map(x => x * x).sum
      assert(r.getAs[Long]("align_dot") == dot)
      assert(r.getAs[Double]("cos_align") ==
        dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(b2.toDouble)))
      assert(r.getAs[Long]("mismatch") == (if (dot < 0) 1L else 0L))
    }
    // both flag values occur on the test corpus (the gate would pass
    // trivially if the stub features never disagreed with the text side)
    assert(out.map(_.getAs[Long]("mismatch")).toSet == Set(0L, 1L))
  }

  test("t31: one row per doc, affinity in (0, 1+eps], and every " +
    "doc's cosine replays from raw term counts") {
    val out = Queries.t31SourceAffinity(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.length == docs.length)
    val docCounts = docs.map { case (id, src, t) =>
      (id, src, t.split(" ", -1).groupBy(identity).view
        .mapValues(_.length.toLong).toMap)
    }
    val srcCounts = docCounts.groupBy(_._2).map { case (src, ds) =>
      src -> ds.flatMap(_._3).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
    }
    val bySrcNorm = srcCounts.map { case (src, m) =>
      src -> m.values.map(c => BigInt(c) * c).sum }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (_, src, cd) = docCounts.find(_._1 == id).get
      val cs = srcCounts(src)
      val num = cd.map { case (t, c) => BigInt(c) * cs(t) }.sum
      val a2 = cd.values.map(c => BigInt(c) * c).sum
      assert(r.getAs[String]("source") == src)
      assert(r.getAs[Long]("n_terms") == cd.size.toLong)
      val aff = r.getAs[Double]("affinity")
      assert(aff == num.toDouble /
        (math.sqrt(a2.toDouble) * math.sqrt(bySrcNorm(src).toDouble)))
      // <= 1 up to one ulp of sqrt rounding (sqrt(x)*sqrt(x) vs x)
      assert(aff > 0.0 && aff <= 1.0 + 1e-12)
    }
  }

  test("p10: leakage set is exactly d2's pairs with differing " +
    "portable-hash split labels") {
    val out = Queries.p10SplitLeakage(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[String]("a_split"), r.getAs[String]("b_split"),
        r.getAs[Double]("jaccard")))
    def split(id: Long): String =
      if (((id % 2147483647L) * 2654435761L) % 2147483647L % 5 == 0) "val"
      else "train"
    out.foreach { case (a, b, sa, sb, _) =>
      assert(sa == split(a) && sb == split(b) && sa != sb)
    }
    val d2pairs = Queries.d2MinhashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("jaccard")).toMap
    val expected = d2pairs.filter { case ((a, b), _) => split(a) != split(b) }
    assert(out.map { case (a, b, _, _, j) => (a, b) -> j }.toMap == expected)
  }

  test("v75: dedup-then-fan-out serving is transparent — both request " +
    "copies of every query get exactly the plain v1 ranking") {
    val out = Queries.v75QueryDedupServe(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist"))))
      .toMap
    val v1 = Queries.v1KnnL2(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist"))))
      .toMap
    assert(out.size == 2 * v1.size)
    v1.foreach { case ((q, rnk), hit) =>
      assert(out((q, rnk)) == hit)
      assert(out((q + 1000000L, rnk)) == hit)
    }
  }

  test("d24: dup_mass replays exactly from a driver-side trigram " +
    "multiset + cross-doc df, one row per doc, dup_frac = mass/total") {
    val out = Queries.d24DupNgramMass(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tri"), r.getAs[Long]("dup_mass"),
          r.getAs[Double]("dup_frac")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").split(" ", -1).toSeq)
    assert(out.size == docs.length)
    val grams = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
    }
    val df = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    grams.foreach { case (id, gs) =>
      val mass = gs.count(g => df(g) >= 2).toLong
      val (nTri, dupMass, frac) = out(id)
      assert(nTri == gs.size.toLong)
      assert(dupMass == mass)
      assert(frac == (if (gs.nonEmpty) mass.toDouble / gs.size else 0.0))
    }
    assert(out.values.exists(_._2 > 0), "corpus should contain cross-doc dups")
  }

  test("p11: the moved set is exactly p10's val members, counted per " +
    "doc, and every row flips val -> train") {
    val out = Queries.p11Resplit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_train_dups"), r.getAs[String]("old_split"),
          r.getAs[String]("new_split")))).toMap
    out.values.foreach { case (_, o, n) => assert(o == "val" && n == "train") }
    val leaks = Queries.p10SplitLeakage(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[String]("a_split"), r.getAs[String]("b_split")))
    val expected = leaks.flatMap { case (a, b, sa, sb) =>
      (if (sa == "val") Seq(a) else Nil) ++ (if (sb == "val") Seq(b) else Nil)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.view.mapValues(_._1).toMap == expected)
  }

  test("v76: route matches the exact-integer predicate, both routes " +
    "are exercised, the exact branch replays the same-class ranking, " +
    "and ivf hits stay inside probed-list ∩ class candidates") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"), $"label".cast("long"),
        $"embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val sizes = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = e.length.toLong
    val nClasses = sizes.size.toLong
    def route(lab: Long): String =
      if (sizes(lab) * nClasses > nTotal) "ivf" else "exact"
    val out = Queries.v76SelectivityRoute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[String]("route")))
    assert(out.map(_._4).toSet == Set("exact", "ivf"),
      "both routes must be exercised by the corpus")
    val byId = e.map(v => v._1 -> v).toMap
    def q(x: Array[Double]): Array[Long] =
      x.map(v => BigDecimal(v * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val (_, qlab, qv) = byId(qid)
      assert(rows.forall(_._4 == route(qlab)))
      if (route(qlab) == "exact") {
        val expected = e.filter(_._2 == qlab)
          .map(v => (d2(q(v._3), q(qv)), v._1)).sorted.take(5).map(_._2)
        assert(rows.sortBy(_._2).map(_._3).toSeq == expected.toSeq)
      } else {
        val cents = e.filter(_._1 < 10).sortBy(_._1)
        val probed = cents.map(c => (d2(q(c._3), q(qv)), c._1))
          .sorted.take(2).map(_._2).toSet
        val cand = e.filter(v => v._2 == qlab &&
          probed(cents.map(c => (d2(q(c._3), q(v._3)), c._1)).min._2))
        val expected = cand.map(v => (d2(q(v._3), q(qv)), v._1))
          .sorted.take(5).map(_._2)
        assert(rows.sortBy(_._2).map(_._3).toSeq == expected.toSeq)
      }
    }
  }

  test("e34: per-type gap quantiles replay from a driver-side sorted " +
    "pick over clipped same-type per-user gaps") {
    val out = Queries.e34GapQuantiles(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("p50_s"),
          r.getAs[Long]("p90_s"), r.getAs[Long]("p99_s")))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id".cast("long"), $"event_id".cast("long"),
        $"event_type", expr("cast(ts as long) div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._3)).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._2)).toList.sliding(2).collect {
        case a :: b :: Nil =>
          (a._3, math.min((b._4 - a._4) / 1000000L, 86400L))
      }
    }
    gaps.groupBy(_._1).foreach { case (t, gs) =>
      val sorted = gs.map(_._2).sorted
      val n = sorted.length
      def pick(r: Long): Long = sorted((r - 1).toInt)
      val (nG, p50, p90, p99) = out(t)
      assert(nG == n.toLong)
      assert(p50 == pick((n + 1) / 2))
      assert(p90 == pick((9L * n + 9) / 10))
      assert(p99 == pick((99L * n + 99) / 100))
    }
    assert(out.keySet == gaps.map(_._1).toSet)
  }

  test("t32: df/total_tf/max_tf/burstiness replay from driver-side " +
    "per-doc term counts, only df >= 10 terms appear") {
    val out = Queries.t32TermBurstiness(spark, sf).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
          r.getAs[Long]("max_tf"), r.getAs[Double]("burstiness")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".cast("long"), $"text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").split(" ", -1).toSeq)
    val perDoc = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, os) => (t, id, os.size.toLong) }
    }
    val expected = perDoc.groupBy(_._1).collect {
      case (t, rows) if rows.length >= 10 =>
        val tf = rows.map(_._3)
        t -> ((rows.length.toLong, tf.sum, tf.max,
          tf.sum.toDouble / rows.length))
    }.toMap
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("v77: segment-merged persisted serving returns exactly v7's " +
    "rows, twice in a row, and the two halves persist disjoint ids") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    val live = key(Queries.v7IvfSearch(spark, sf))
    val p1 = key(Queries.v77IndexMergeServe(spark, sf))
    val p2 = key(Queries.v77IndexMergeServe(spark, sf))
    assert(p1.sameElements(live))
    assert(p2.sameElements(live))
  }

  test("d25: collision counts bounded by the band count, precision = " +
    "verified/candidates, and the verified total reconciles with d2") {
    val out = Queries.d25LshPrecision(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_bands"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_verified"), r.getAs[Double]("precision")))
    assert(out.nonEmpty)
    out.foreach { case (b, c, v, p) =>
      assert(b >= 1 && b <= 4)
      assert(v >= 0 && v <= c)
      assert(p == v.toDouble / c)
    }
    val d2n = Queries.d2MinhashPairs(spark, sf).count()
    assert(out.map(_._3).sum == d2n,
      "every d2 pair verifies in exactly one collision-count bucket")
  }

  test("v74: one row per vector, a2 <= b2, sil in [0,1], centroid " +
    "vectors score a2 = 0 and sil = 1, assignment matches v6's " +
    "argmin, and a2/b2 replay from scratch") {
    val out = Queries.v74Silhouette(spark, sf).collect()
    val scale = graft.functions.VectorFunctions.DefaultScale
    val g = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * scale)).toArray)
      .toMap
    assert(out.length == g.size)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = g.filter(_._1 < 10).toSeq.sortBy(_._1)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val ds = cents.map { case (cid, cv) => (d2(g(id), cv), cid) }.sorted
      assert(r.getAs[Long]("centroid_id") == ds.head._2)
      assert(r.getAs[Long]("a2") == ds.head._1)
      assert(r.getAs[Long]("b2") == ds(1)._1)
      val sil = r.getAs[Double]("sil")
      assert(r.getAs[Long]("a2") <= r.getAs[Long]("b2"))
      assert(sil >= 0.0 && sil <= 1.0)
      if (id < 10) { assert(r.getAs[Long]("a2") == 0L); assert(sil == 1.0) }
    }
  }
}

package graft

import graft.operators.{Clustering, Dedup}
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-6 continuation batch: farthest-point
  * seeds (v41), Rocchio query expansion (v42), representative pick
  * (d19), Good-Turing spectrum (t19), session-shape stats (e20).
  * Exact value parity is covered by the DuckDB oracle gate; these
  * assert the semantic properties the oracle can't name.
  */
class Round6cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def quantized: Map[Long, Array[Long]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".cast("long"),
        graft.functions.VectorFunctions.quantize($"embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private def l2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("v41: four distinct seeds; each d2 is the exact maximin " +
    "distance to the prior seeds; gaps are non-increasing") {
    val rows = Queries.v41MaximinSeeds(spark, sf)
      .orderBy("seed_rank").collect()
    assert(rows.length == 4)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 4)
    val vecs = quantized
    assert(ids(0) == vecs.keys.min)
    // replay the maximin selection in plain Scala
    (1 until 4).foreach { i =>
      val chosen = ids.take(i).map(vecs)
      val best = vecs.toSeq
        .map { case (id, v) => (chosen.map(l2(v, _)).min, id) }
        .minBy { case (md, id) => (-md, id) }
      assert(best._2 == ids(i), s"seed ${i + 1}")
      assert(best._1 == rows(i).getAs[Long]("d2"), s"d2 of seed ${i + 1}")
    }
    // FPS maximin radii never increase as the chosen set grows
    val d2s = rows.drop(1).map(_.getAs[Long]("d2"))
    assert(d2s.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("v42: 5 ranked hits per query; replay of query 0's expanded " +
    "search agrees exactly") {
    val out = Queries.v42QueryExpansion(spark, sf).collect()
    val vecs = quantized
    val nQ = vecs.keys.count(_ % 100 == 0)
    assert(out.length == nQ * 5)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val ds = sorted.map(_.getAs[Long]("d2s"))
      assert(ds.sliding(2).forall(w => w(0) <= w(1)))
    }
    // scala replay for query 0: v1 top-5 + self, summed, re-ranked
    val q0 = vecs(0L)
    val top5 = vecs.toSeq
      .map { case (id, v) => (l2(v, q0), id) }.sorted.take(5).map(_._2)
    val e = (top5.map(vecs) :+ q0)
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    val expect = vecs.toSeq
      .map { case (id, g) =>
        (g.zip(e).map { case (gj, ej) =>
          (6 * gj - ej) * (6 * gj - ej) }.sum, id) }
      .sorted.take(5)
    val got = out.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[Long]("d2s"), r.getAs[Long]("neighbor_id")))
    assert(got.toSeq == expect)
  }

  test("d19: one row per cluster, members partition the corpus, and " +
    "the kept doc is the cluster's longest (ties to min id)") {
    val picks = Queries.d19RepPick(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(picks.map(_.getAs[Long]("n_members")).sum == docs.count())
    val labels = Clustering.connectedComponents(
        Dedup.simhashDupEdges(docs, "doc_id", "text"), "a_id", "b_id",
        docs.select(col("doc_id")), "doc_id")
      .join(docs.select(col("doc_id").cast("long").as("id"),
        col("n_chars").cast("long").as("n_chars")), "id")
      .collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    assert(picks.length == labels.size)
    picks.foreach { p =>
      val members = labels(p.getAs[Long]("cluster_id"))
        .map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("id")))
      val best = members.minBy { case (n, id) => (-n, id) }
      assert(p.getAs[Long]("keep_id") == best._2)
      assert(p.getAs[Long]("keep_n_chars") == best._1)
      assert(p.getAs[Long]("total_chars") == members.map(_._1).sum)
    }
  }

  test("t19: spectrum mass equals the token count and the GT " +
    "numerators reconcile against N_1") {
    val rows = Queries.t19GoodTuring(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t")).count()
    assert(rows.map(r => r.getAs[Long]("r") * r.getAs[Long]("n_r")).sum
      == total)
    // gt_num(r) = (r+1) * N_{r+1}, reading N from the sparse spectrum
    val spectrum = rows
      .map(r => r.getAs[Long]("r") -> r.getAs[Long]("n_r")).toMap
    rows.foreach { r =>
      val rv = r.getAs[Long]("r")
      assert(r.getAs[Long]("gt_num")
        == (rv + 1) * spectrum.getOrElse(rv + 1, 0L))
      assert(r.getAs[Double]("gt_star")
        === r.getAs[Long]("gt_num").toDouble / r.getAs[Long]("n_r"))
    }
  }

  test("v43: both power-iteration steps replay exactly in BigInt") {
    val rows = Queries.v43PowerIteration(spark, sf)
      .orderBy("dim").collect()
    assert(rows.length == 64)
    val vecs = quantized.values.toSeq
    val y = (0 until 64).map(i =>
      vecs.map(v => v(i) * v.sum).sum)
    assert(rows.map(_.getAs[Long]("y1")).toSeq == y)
    val x2 = (0 until 64).map { i =>
      vecs.map { v =>
        val tn = v.zip(y).map { case (gj, yj) =>
          BigInt(gj) * BigInt(yj) }.sum
        BigInt(v(i)) * tn
      }.sum
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("x2") === x2(i).toDouble, s"dim $i")
    }
  }

  test("e21: attribution groups partition the user base and credited " +
    "revenue never exceeds total purchase revenue") {
    val rows = Queries.e21Attribution(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n_users")).sum
      == ev.select("user_id").distinct().count())
    val totalCents = ev.filter(col("event_type") === "purchase")
      .select(sum(round(col("value") * 10000).cast("long")))
      .collect()(0).getLong(0)
    val attributed = rows.map(_.getAs[Double]("attr_value")).sum
    assert(math.abs(attributed - totalCents / 10000.0) < 1e-6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buyers") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Double]("conv_rate")
        === r.getAs[Long]("n_buyers").toDouble / r.getAs[Long]("n_users"))
    }
  }

  test("v44: reconstruction error is zero exactly for the codebook " +
    "seed vectors and positive mass reconciles") {
    val r = Queries.v44PqError(spark, sf).collect().head
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("max_err") >= 0L)
    assert(r.getAs[Long]("sum_err") >= r.getAs[Long]("max_err"))
    assert(r.getAs[Double]("mean_err")
      === r.getAs[Long]("sum_err").toDouble / n)
  }

  test("m8: digest groups partition the assets and keep_id is a member") {
    val rows = Queries.m8AssetDedup(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_copies")).sum == docs.count())
    // d1's text-hash dedup and m8's payload-digest dedup agree on the
    // duplicate mass (same content ⇔ same bytes for string payloads)
    val d1Dups = Queries.d1DedupExact(spark, sf).collect()
      .map(_.getAs[Long]("n")).filter(_ > 1).sorted.toSeq
    val m8Dups = rows.map(_.getAs[Long]("n_copies")).filter(_ > 1)
      .sorted.toSeq
    assert(m8Dups == d1Dups)
  }

  test("d20: deciles bounded, cumulative counts are a running total, " +
    "and the >=0.5 mass covers d2's pair count") {
    val rows = Queries.d20ThresholdCurve(spark, sf).collect()
      .sortBy(-_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 10L)
    }
    val running = rows.map(_.getAs[Long]("n_pairs")).scanLeft(0L)(_ + _)
    assert(rows.map(_.getAs[Long]("cum_pairs")).toSeq ==
      running.drop(1).toSeq)
    // every d2 pair (jaccard >= 0.5) sits in deciles 5..10
    val d2Count = Queries.d2MinhashPairs(spark, sf).count()
    val highMass = rows.filter(_.getAs[Long]("bucket") >= 5L)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(highMass >= d2Count)
  }

  test("t20: RAKE degree >= frequency (every occurrence adds >= 1) " +
    "and stopwords never score") {
    val rows = Queries.t20RakeKeywords(spark, sf).collect()
    assert(rows.nonEmpty)
    val stops = graft.functions.TextFunctions.stopwords.toSet
    rows.foreach { r =>
      assert(!stops.contains(r.getAs[String]("term")))
      assert(r.getAs[Long]("deg") >= r.getAs[Long]("freq"))
      assert(r.getAs[Double]("score") === r.getAs[Long]("deg").toDouble
        / r.getAs[Long]("freq"))
    }
    // total degree mass = sum over phrases of plen^2; freq mass = tokens
    val nonStopTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(!col("t").isInCollection(stops.toSeq)).count()
    assert(rows.map(_.getAs[Long]("freq")).sum == nonStopTokens)
  }

  test("e22: stickiness in (0,1], wau >= dau, every active day reports") {
    val rows = Queries.e22Stickiness(spark, sf).collect()
    val nDays = graft.sources.Tables.events(spark, sf)
      .select((col("ts") - pmod(col("ts"), lit(86400000000000L)))
        .as("d")).distinct().count()
    assert(rows.length == nDays)
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
      assert(s === r.getAs[Long]("dau").toDouble / r.getAs[Long]("wau"))
    }
  }

  test("v45: occupancy histogram partitions the gallery and buckets " +
    "are bounded by the bit width") {
    val rows = Queries.v45LshBucketStats(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == n)
    assert(rows.map(r => r.getAs[Long]("bucket_size")
      * r.getAs[Long]("n_buckets")).sum == n)
    // at most 2^6 distinct buckets exist
    assert(rows.map(_.getAs[Long]("n_buckets")).sum <= 64L)
  }

  test("v46: recall is monotone non-decreasing in nprobe and v39's " +
    "point sits on the curve") {
    val rows = Queries.v46ProbeCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.sliding(2).forall(w => w(0) <= w(1) + 1e-12))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Double]("recall") === r.getAs[Long]("n_hit").toDouble
        / r.getAs[Long]("n_total"))
    }
    // nprobe=2 point equals the aggregate of v39's per-query rows
    val v39Hits = Queries.v39IvfRecall(spark, sf).collect()
      .map(_.getAs[Long]("n_hit")).sum
    assert(rows(1).getAs[Long]("n_hit") == v39Hits)
  }

  test("t21: five ranked keywords per source, chi2 non-negative and " +
    "non-increasing with rank") {
    val rows = Queries.t21Chi2Keywords(spark, sf).collect()
    val sources = rows.map(_.getAs[String]("source")).distinct
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val chis = sorted.map(_.getAs[Double]("chi2"))
      assert(chis.forall(_ >= 0.0))
      assert(chis.sliding(2).forall(w => w(0) >= w(1)))
    }
    assert(rows.length == sources.length * 5)
  }

  test("q32: the kept supplier has the exact minimum unit cost among " +
    "the part's suppliers") {
    val rows = Queries.q32CheapestSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000).cast("long")).as("cents"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty"))
      .collect()
      .groupBy(_.getAs[Long]("pk"))
    rows.foreach { r =>
      val members = byPair(r.getAs[Long]("p_partkey")).map { m =>
        (Math.floorDiv(m.getAs[Long]("cents") * 1000000L,
          m.getAs[Long]("qty")), m.getAs[Long]("sk"))
      }
      assert(r.getAs[Long]("n_suppliers") == members.length)
      assert((members.min._1 / 1e8, members.min._2)
        == (r.getAs[Double]("best_unit_price"),
            r.getAs[Long]("best_suppkey")))
    }
  }

  test("e20: histogram reconciles with e2's session and event totals") {
    val hist = Queries.e20SessionStats(spark, sf).collect()
    val e2 = Queries.e2Sessionize(spark, sf).collect()
    assert(hist.map(_.getAs[Long]("n_sessions")).sum
      == e2.map(_.getAs[Long]("n_sessions")).sum)
    assert(hist.map(_.getAs[Long]("sum_events")).sum
      == e2.map(_.getAs[Long]("n_events")).sum)
    hist.foreach { h =>
      assert(h.getAs[Long]("dur_min") >= 0L)
      assert(h.getAs[Long]("max_len") <= h.getAs[Long]("sum_events"))
      assert(h.getAs[Double]("avg_len") === h.getAs[Long]("sum_events")
        .toDouble / h.getAs[Long]("n_sessions"))
    }
  }
}

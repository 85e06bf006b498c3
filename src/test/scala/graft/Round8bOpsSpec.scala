package graft

import graft.queries.Queries

/** Invariant specs for the round-8b batch: the SQ4 quantizer pair
  * (v82/v83), oversampled maximin seeding (v84), and filtered beam
  * search (v85). Exact value parity is covered by the DuckDB oracle
  * gate; these assert the semantic properties the oracle can't name.
  */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("v82: k=5 rows per query, dense ranks, non-decreasing code-space " +
    "distances, deterministic across two runs") {
    val out = Queries.v82Sq4Knn(spark, sf).collect()
    val nQ = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == nQ)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val dists = sorted.map(_.getAs[Double]("dist")).toSeq
      assert(dists == dists.sorted)
      dists.foreach(d => assert(d >= 0.0))
    }
    def key(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    assert(key(Queries.v82Sq4Knn(spark, sf).collect()).sameElements(key(out)))
  }

  test("v82: 4-bit code-space distances are bounded by the grid — " +
    "d2 <= 64 * 15^2, so dist <= sqrt(14400)") {
    // each per-dim code delta is in [-15, 15]; 64 dims bound the
    // squared distance at 64 * 225 = 14400 — a property the 8-bit
    // chain (bound 64 * 255^2) cannot satisfy, so it proves the
    // levels parameter actually reached the encode.
    Queries.v82Sq4Knn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("dist") <= math.sqrt(64.0 * 15 * 15) + 1e-9)
    }
  }

  test("v83: recall row recomputes exactly from the gated v82 and v1 " +
    "outputs (n_hit = |approx top-5 ∩ exact top-5|, k = 5)") {
    val exact = Queries.v1KnnL2(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val approx = Queries.v82Sq4Knn(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val rows = Queries.v83Sq4Recall(spark, sf).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val expected = (exact(q) & approx(q)).size.toLong
      assert(r.getAs[Long]("n_hit") == expected)
      assert(r.getAs[Long]("k") == 5L)
      assert(math.abs(r.getAs[Double]("recall_at_5") - expected / 5.0) < 1e-12)
    }
  }

  test("v84: 9 rows (1 anchor + 2 rounds of 4), md non-increasing " +
    "within each round, and round 1's first pick IS v41's second seed " +
    "(identical argmax over the identical chosen set)") {
    val out = Queries.v84OversampledMaximin(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("pick_rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("md")))
      .sortBy(t => (t._1, t._2))
    assert(out.length == 9)
    assert(out.head == ((0L, 1L, out.head._3, 0L)))
    for (r <- 1 to 2) {
      val mds = out.filter(_._1 == r).sortBy(_._2).map(_._4)
      assert(mds.length == 4)
      assert(mds.zip(mds.tail).forall { case (a, b) => a >= b })
    }
    val v41 = Queries.v41MaximinSeeds(spark, sf).collect()
      .map(r => (r.getAs[Long]("seed_rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2"))).sortBy(_._1)
    // anchor = v41's seed 1; round-1 pick 1 = v41's seed 2 (both are
    // argmax of distance-to-anchor, ties to min id), with equal md.
    assert(out(0)._3 == v41(0)._2)
    val firstPick = out.find(t => t._1 == 1L && t._2 == 1L).get
    assert(firstPick._3 == v41(1)._2 && firstPick._4 == v41(1)._3)
  }

  test("v85: dense ranks <= 3, every returned node satisfies the " +
    "predicate, and per query the rank-1 distance is >= v15's exact " +
    "filtered rank-1 (an approximate pool can't beat the exact scan)") {
    val allowed = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"label" % 3 === 0)
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val out = Queries.v85FilteredBeam(spark, sf).collect()
    out.foreach(r => assert(allowed.contains(r.getAs[Long]("node_id"))))
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to sorted.length.toLong))
      assert(sorted.length <= 3)
      val dists = sorted.map(_.getAs[Double]("dist")).toSeq
      assert(dists == dists.sorted)
    }
    val exactBest = Queries.v15FilteredKnn(spark, sf).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("dist"))
      .toMap
    out.filter(_.getAs[Long]("rnk") == 1L).foreach { r =>
      assert(r.getAs[Double]("dist") >=
        exactBest(r.getAs[Long]("query_id")) - 1e-9)
    }
  }

  test("v86: persisted-code serving equals the rebuild-shape v17 " +
    "bit-for-bit, twice in a row (persistence is transparent and the " +
    "second call serves the stored codes)") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = key(Queries.v17Sq8Knn(spark, sf))
    assert(key(Queries.v86Sq8Persisted(spark, sf)) == expected)
    assert(key(Queries.v86Sq8Persisted(spark, sf)) == expected)
    assert(expected.nonEmpty)
  }
}

package graft

import graft.queries.Queries
import org.apache.spark.sql.Row

/** Invariant specs for the round-10 beam ef tuning curve (v96). Exact
  * value parity with DuckDB is the oracle gate's job; these prove the
  * curve's internal consistency — v81's gated point sits ON the curve,
  * counts recompute from the gated v79/v1 outputs, and the
  * quality/cost ordering reads the way a deployment would tune it.
  */
class Round10OpsSpec extends SparkSpec {

  private lazy val curve: Map[Long, Row] =
    Queries.v96EfCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("ef") -> r).toMap

  test("v96: one row per ef in {2,4,8}; n_total = 5·Q; recall is the " +
    "quotient of its own exact counts") {
    assert(curve.keySet == Set(2L, 4L, 8L))
    val nq = Queries.v1KnnL2(spark, sf).collect()
      .map(_.getAs[Long]("query_id")).distinct.length
    curve.values.foreach { r =>
      assert(r.getAs[Long]("n_total") == 5L * nq)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Double]("recall") ==
        r.getAs[Long]("n_hit").toDouble / r.getAs[Long]("n_total"))
    }
  }

  test("v96: v81's gated point sits on the curve — n_hit at ef=4 " +
    "equals v81's summed frontier hits and the v79∩v1 overlap") {
    val v81Hits = Queries.v81BeamRecall(spark, sf).collect()
      .map(_.getAs[Long]("frontier_hits")).sum
    val exact = Queries.v1KnnL2(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val beamHits = Queries.v79BeamSearch(spark, sf).collect()
      .count(r => exact(
        (r.getAs[Long]("query_id"), r.getAs[Long]("node_id"))))
    assert(curve(4L).getAs[Long]("n_hit") == v81Hits)
    assert(curve(4L).getAs[Long]("n_hit") == beamHits.toLong)
  }

  test("v96: aggregate recall and distance-eval cost are non-" +
    "decreasing in ef on the fixture corpus") {
    // Fixture-level expectation, not an invariant: beyond step 1 the
    // ef=2 frontier is not a subset of the ef=4 frontier (top-2 of a
    // subset can leave top-4 of its superset), so per-ef dominance is
    // data-dependent — the aggregate ordering is what the curve is FOR
    // (the v88-spec relaxation precedent applied from the start).
    assert(curve(2L).getAs[Double]("recall") <=
      curve(4L).getAs[Double]("recall"))
    assert(curve(4L).getAs[Double]("recall") <=
      curve(8L).getAs[Double]("recall"))
    assert(curve(2L).getAs[Long]("dist_evals") <=
      curve(4L).getAs[Long]("dist_evals"))
    assert(curve(4L).getAs[Long]("dist_evals") <=
      curve(8L).getAs[Long]("dist_evals"))
  }

  private lazy val probeCurve: Map[Long, Row] =
    Queries.v97TrainedProbeCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("nprobe") -> r).toMap

  test("v97: one row per nprobe in {1,2,4}; v92's gated point sits on " +
    "the curve (summed n_hit at nprobe=2)") {
    assert(probeCurve.keySet == Set(1L, 2L, 4L))
    val v92Hits = Queries.v92TrainedIvfRecall(spark, sf).collect()
      .map(_.getAs[Long]("n_hit")).sum
    assert(probeCurve(2L).getAs[Long]("n_hit") == v92Hits)
    probeCurve.values.foreach { r =>
      assert(r.getAs[Double]("recall") ==
        r.getAs[Long]("n_hit").toDouble / r.getAs[Long]("n_total"))
    }
  }

  test("v97: recall is monotone non-decreasing in nprobe — an " +
    "INVARIANT here, not a fixture property") {
    // Probe sets nest (same qr ranking, deeper rn cutoff), so each
    // query's candidate pool is a superset at higher nprobe, and a
    // top-5 member of the smaller pool that is also in the exact
    // top-5 can only be displaced by candidates that are themselves
    // exact-top-5 members (at most 4 gallery rows precede an exact-
    // rank-r<=5 hit) — per-query hits never decrease.
    assert(probeCurve(1L).getAs[Long]("n_hit") <=
      probeCurve(2L).getAs[Long]("n_hit"))
    assert(probeCurve(2L).getAs[Long]("n_hit") <=
      probeCurve(4L).getAs[Long]("n_hit"))
  }

  test("v98: every neighbor satisfies the predicate, results are a " +
    "filter-then-rank of v90's probed candidates, and serving twice " +
    "is stable") {
    import org.apache.spark.sql.functions.col
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def key(rows: Array[Row]) = rows.map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2)).toSeq
    val served1 = key(Queries.v98FilteredTrainedIvf(spark, sf).collect())
    val served2 = key(Queries.v98FilteredTrainedIvf(spark, sf).collect())
    assert(served1 == served2 && served1.nonEmpty)
    served1.foreach { case (_, _, nid, _) =>
      assert(labels(nid) % 3 == 0)
    }
    // filter-then-rank, not rank-then-filter: any v90 (unfiltered)
    // top-5 hit that satisfies the predicate must appear in v98 at an
    // equal-or-better rank — the filter can only REMOVE competitors
    // ahead of it, never add them (v58's contract on the trained
    // index).
    val unfiltered = Queries.v90TrainedIvfPersisted(spark, sf).collect()
    val v98rank = served1.map { case (q, rnk, nid, _) => (q, nid) -> rnk }
      .toMap
    unfiltered.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val nid = r.getAs[Long]("neighbor_id")
      if (labels(nid) % 3 == 0) {
        val rk = v98rank.get((q, nid))
        assert(rk.isDefined && rk.get <= r.getAs[Long]("rnk"))
      }
    }
  }
}

package graft

import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-7 batch: persisted-graph serving
  * (v64) and the trained-quantizer IVF chain (v65). Exact value
  * parity is covered by the DuckDB oracle gate; these assert the
  * semantic properties the oracle can't name.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("v64: the persisted walk returns exactly v57's endpoints " +
    "(persistence round-trips the graph bit-exactly), twice in a row " +
    "(second call serves from the store)") {
    val live = Queries.v57GraphSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("node_id"),
        r.getAs[Double]("dist"))).sortBy(_._1)
    val p1 = Queries.v64GraphSearchPersisted(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("node_id"),
        r.getAs[Double]("dist"))).sortBy(_._1)
    val p2 = Queries.v64GraphSearchPersisted(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("node_id"),
        r.getAs[Double]("dist"))).sortBy(_._1)
    assert(p1.sameElements(live))
    assert(p2.sameElements(live))
  }

  test("v64: the edge list is served from a catalog table whose name " +
    "carries the source-data fingerprint") {
    Queries.v64GraphSearchPersisted(spark, sf).collect()
    val fp = graft.sources.BucketedStore
      .fingerprint(s"$sf/embeddings.parquet")
    assert(fp != "absent" && fp.length == 8)
    val expected = "graft_knn_edges_" +
      sf.replaceAll("[^a-zA-Z0-9]", "_") + "_" + fp
    assert(spark.catalog.tableExists(expected))
  }

  test("v65: k=5 rows per query with ascending ranks/distances, and " +
    "every neighbor lies in one of the query's 2 probed trained lists") {
    val out = Queries.v65TrainedIvfSearch(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    val nQ = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    assert(byQ.size == nQ)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val dists = sorted.map(_.getAs[Double]("dist")).toSeq
      assert(dists == dists.sorted)
    }
    // the gate's strongest internal check: neighbors come only from
    // probed trained lists. Reconstruct the trained assignment via the
    // same public chain (v26's stats prove the training itself) by
    // asserting each (query, neighbor) pair shares a list with ONE of
    // the probe centroids — cheap proxy: a neighbor at rank 1 of its
    // own query (query % 100 == 0 is in the gallery, self d2 = 0, and
    // self's list is always probed because it is the argmin list).
    out.filter(r => r.getAs[Long]("query_id") ==
        r.getAs[Long]("neighbor_id"))
      .foreach(r => assert(r.getAs[Long]("rnk") == 1L &&
        r.getAs[Double]("dist") == 0.0))
  }

  test("v65: trained search beats seeded v7 on agreement with the " +
    "exact top-k no less than v7 misses it (sanity: the trained " +
    "quantizer is a usable index, recall@5 vs v1 > 0.5)") {
    val exact = Queries.v1KnnL2(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = Queries.v65TrainedIvfSearch(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val recall = trained.count(exact.contains).toDouble / trained.length
    assert(recall > 0.5, s"trained-IVF recall@5 vs exact = $recall")
  }
  test("v68: k=5 rows per query, dense ascending ranks, " +
    "non-decreasing ADC distances, deterministic across two runs") {
    val out = Queries.v68TrainedIvfPq(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    val nQ = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" % 100 === 0).count()
    assert(byQ.size == nQ)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to 5L))
      val dists = sorted.map(_.getAs[Double]("dist")).toSeq
      assert(dists == dists.sorted)
      dists.foreach(d => assert(d >= 0.0))
    }
    // training + floored centroids + seeded codebooks are all
    // deterministic functions of the data: a second full run must
    // reproduce the result bit-for-bit (collects, localCheckpoint and
    // driver-side probe routing included).
    val again = Queries.v68TrainedIvfPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    val first = out
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist")))
      .sortBy(t => (t._1, t._2))
    assert(again.sameElements(first))
  }

  test("v68: the trained compressed index is usable — recall@5 vs " +
    "the exact scan is in seeded v21's league (the trained quantizer " +
    "must not wreck what the seeded one achieves on the same data)") {
    val exact = Queries.v1KnnL2(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      hits.count(exact.contains).toDouble / hits.length
    }
    val seeded = recall(Queries.v21IvfPqResidual(spark, sf))
    val trained = recall(Queries.v68TrainedIvfPq(spark, sf))
    // nprobe=2/10 and a 16-entry residual codebook cap recall well
    // below 1.0 at this tiny SF for BOTH constructions; the check is
    // relative (trained ≥ 70% of seeded), not an absolute bar.
    assert(trained >= seeded * 0.7,
      s"trained-IVFPQ recall@5 = $trained vs seeded v21 = $seeded")
  }
}

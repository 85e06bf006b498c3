package graft

import graft.functions.VectorFunctions.quantize
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-12 keys. Exact value parity with
  * DuckDB is the oracle gate's job; these prove the claims the gates
  * rest on — the tombstone-aware walk never surfaces a dead node and
  * always terminates (v108), the bypass semantics match an
  * INDEPENDENT driver-side simulation of the walk (the v104
  * independent-re-encode precedent applied to graph serving), and the
  * recall rows recompute from their gated input frames (v113).
  */
class Round12OpsSpec extends SparkSpec {

  private def tombstoneIds: Set[Long] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet

  test("v108: no dead node ever surfaces in the served frontier") {
    val dead = tombstoneIds
    val out = Queries.v108GraphTombstoneSearch(spark, sf)
      .select(col("query_id"), col("node_id")).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !dead.contains(r.getLong(1))))
  }

  test("v108: the walk terminates with a full frontier for every " +
    "query (fixture-level: 4 ranked rows each)") {
    val out = Queries.v108GraphTombstoneSearch(spark, sf)
      .groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    val nq = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 100 === 0).count()
    assert(out.length.toLong === nq)
    assert(out.forall(_.getLong(1) === 4L))
  }

  test("v108: the fixture's global min id is DEAD, so the alive-entry " +
    "and bypass paths are exercised from step 0 (fixture-level)") {
    val minId = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(min(col("vec_id").cast("long"))).collect()(0).getLong(0)
    assert(minId % 7 === 0L)
  }

  test("v108: an independent driver-side simulation of the " +
    "bypass walk reproduces the gated frame exactly") {
    // Graph, vectors, and delete set collected once (sf0.001 is small
    // by construction); the walk below shares NO code with the query.
    val edges = Queries.v28KnnGraph(spark, sf)
      .select(col("src_id"), col("dst_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toList) }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        quantize(col("embedding")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    val dead = tombstoneIds
    val entry = vecs.keySet.filterNot(dead).min
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val queries = vecs.keySet.filter(_ % 100 == 0).toList.sorted
    val expected = queries.flatMap { qid =>
      val qv = vecs(qid)
      var frontier = Set(entry)
      var ranked: List[(Long, Long)] = Nil // (rnk, nid)
      for (_ <- 1 to 3) {
        val nbrs = frontier.flatMap(n => edges.getOrElse(n, Nil))
        val bypass = nbrs.filter(dead)
          .flatMap(n => edges.getOrElse(n, Nil))
        val cand = (frontier ++ nbrs ++ bypass).filterNot(dead)
        ranked = cand.toList
          .map(n => (d2(vecs(n), qv), n))
          .sortBy(identity).take(4).zipWithIndex
          .map { case ((_, n), i) => (i + 1L, n) }
        frontier = ranked.map(_._2).toSet
      }
      ranked.map { case (rnk, nid) => (qid, rnk, nid) }
    }.toSet
    val got = Queries.v108GraphTombstoneSearch(spark, sf)
      .select(col("query_id"), col("rnk"), col("node_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === expected)
  }

  test("v113: frontier_hits recomputes from the gated v108 frame and " +
    "an alive-only exact top-5") {
    val frontier = Queries.v108GraphTombstoneSearch(spark, sf)
      .select(col("query_id"), col("node_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dead = tombstoneIds
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        quantize(col("embedding")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def d2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val aliveIds = vecs.keySet.filterNot(dead)
    val exactTop5 = vecs.keySet.filter(_ % 100 == 0).map { qid =>
      val qv = vecs(qid)
      (qid, aliveIds.toList.map(n => (d2(vecs(n), qv), n))
        .sortBy(identity).take(5).map(_._2).toSet)
    }.toMap
    val out = Queries.v113GraphMaintainedRecall(spark, sf)
      .select(col("query_id"), col("frontier_hits")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val qid = r.getLong(0)
      val hits = frontier.filter(_._1 == qid).map(_._2)
        .count(exactTop5(qid).contains)
      assert(r.getLong(1) === hits.toLong, s"query $qid")
    }
  }
}

package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF+PQ composite index search — the canonical billion-scale FAISS
  * shape (IndexIVFPQ with by_residual=false), composed from graft's IVF
  * partitioning and PQ codes:
  *
  *  - coarse quantizer routes each query to `nprobe` centroids
  *    (tiny crossjoin, centroids broadcast-sized);
  *  - the codes table is pruned to probed partitions by a broadcast
  *    join on centroid_id (on the persisted partitioned layout this is
  *    partition pruning — reads nprobe/nlist of the data);
  *  - ranking is PQ asymmetric distance: per-query lookup tables folded
  *    in as one literal map keyed by query_id, summed map-side per
  *    candidate row — no exchange between the prune and the O(Q·k)
  *    partial top-k.
  *
  * Reference anchor: faiss_utils.py:4-22 (flat index build/search this
  * scales out from).
  */
object IvfPq {

  /** Search codes pruned by IVF probes, ranked by ADC.
    *
    * @param codes (id, codes, centroid_id) — PqIndex.encode joined to
    *              IvfIndex.assign output (the persisted index layout)
    * @param centroids (cidCol, vecCol) coarse centroids
    * @param queries (qidCol, vecCol) broadcast-sized query set
    * @param book PQ codebooks (PqIndex.train or seeded)
    * @param scale fixed-point scale ALREADY applied to vecCol values
    *              (pass 1 when vectors are pre-quantized integers)
    * @return (query_id, rnk, neighbor_id, dist), dist = sqrt(adc)
    */
  def search(codes: DataFrame, centroids: DataFrame, queries: DataFrame,
             cidCol: String, qidCol: String, vecCol: String, dim: Int,
             m: Int, book: Seq[PqIndex.Codebook], k: Int, nprobe: Int,
             scale: Int = 1): DataFrame = {
    val sub = dim / m
    val probes = KnnJoin.knnL2(
      centroids.select(col(cidCol), col(vecCol)), queries,
      cidCol, vecCol, qidCol, k = nprobe, scale = scale)
      .select(col("query_id"), col("neighbor_id").as("centroid_id"))
    val bySub: Map[Int, Seq[PqIndex.Codebook]] =
      book.groupBy(_.sub).map { case (j, cbs) => j -> cbs.sortBy(_.cid) }
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(qidCol).cast("long"), toDoubleArray(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    // one literal map: query_id -> [sub -> [cid -> d2]] — the per-row
    // lookup is then a pure map-side expression over candidate rows
    val dtabs: Column = map(qRows.flatMap { case (qid, qvec) =>
      val dtab = (0 until m).map { j =>
        array(bySub(j).map { cb =>
          var acc = 0.0
          var i = 0
          while (i < sub) {
            val dd = qvec(j * sub + i) - cb.centroid(i)
            acc += dd * dd; i += 1
          }
          lit(acc)
        }: _*)
      }
      Seq(lit(qid), array(dtab: _*))
    }.toIndexedSeq: _*)
    val cand = codes
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("dtab", element_at(dtabs, col("query_id")))
    val adc = (0 until m)
      .map(j => element_at(element_at(col("dtab"), j + 1),
        col("codes").getItem(j) + 1))
      .reduce(_ + _)
    val scored = cand.select(col("query_id"),
      col("id").cast("long").as("neighbor_id"), adc.as("adc"))
    TopK.perGroup(scored, "query_id", "neighbor_id", "adc", k,
      ascending = true)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        sqrt(col("adc")).as("dist"))
  }
}

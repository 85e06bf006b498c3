package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the compressed-index scale path of a
  * FAISS-style engine (IndexPQ/IVFPQ semantics re-expressed as
  * DataFrame ops). A D-dim float vector becomes `m` small codes
  * (argmin centroid per subspace), an ~D·4/m-fold compression; queries
  * then rank candidates with asymmetric distance (ADC): exact query
  * sub-vectors against the codebook, summed via a per-query lookup
  * table.
  *
  * Scale shape: codebooks are tiny (m × ksub × D/m) → driver/broadcast;
  * encoding is a map-only pass over the gallery (literal-folded argmin,
  * fully codegen'd); ADC search shuffles only (gallery_id × m) code
  * rows joined to a broadcast distance table, then partial top-k — the
  * 100 TB gallery is never touched at full precision.
  */
object PqIndex {

  case class Codebook(sub: Int, cid: Int, centroid: Seq[Double])

  /** Seeded codebooks: sub-slices of the first `ksub` vectors by id —
    * the derive-from-data construction the oracle-gated queries use so
    * the DuckDB twins can reconstruct the identical codebooks in SQL.
    * Single source of truth for v11/v13/ScaleProbe. */
  def seededBook(vecs: DataFrame, idCol: String, vecCol: String,
                 dim: Int, m: Int, ksub: Int): Seq[Codebook] = {
    val sub = dim / m
    vecs.filter(col(idCol) < ksub)
      .select(col(idCol).cast("long"), toDoubleArray(col(vecCol)))
      .collect()
      .flatMap { r =>
        val cid = r.getLong(0).toInt
        val v = r.getSeq[Double](1)
        (0 until m).map(j =>
          Codebook(j, cid, v.slice(j * sub, (j + 1) * sub)))
      }.toSeq
  }

  /** Train per-subspace codebooks with deterministic Lloyd k-means.
    * dim must divide evenly into m subspaces. */
  def train(spark: SparkSession, vecs: DataFrame, idCol: String,
            vecCol: String, dim: Int, m: Int, ksub: Int,
            iters: Int): Seq[Codebook] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).flatMap { j =>
      val slice_j = vecs.select(col(idCol),
        slice(toDoubleArray(col(vecCol)), j * sub + 1, sub).as("subvec"))
      IvfIndex.train(spark, slice_j, idCol, "subvec", ksub, iters)
        .collect()
        .map(r => Codebook(j, r.getLong(0).toInt, r.getSeq[Double](1)))
    }
  }

  /** Literal-folded argmin over an ALREADY-SLICED subvector column:
    * distance against every centroid of the subspace's codebook,
    * smallest (d2, cid) wins. */
  private[operators] def encodeSub(sliceCol: Column, j: Int,
                                   book: Seq[Codebook]): Column = {
    val cands = book.filter(_.sub == j).sortBy(_.cid).map { cb =>
      val cent = array(cb.centroid.map(lit): _*)
      struct(l2DistSq(sliceCol, cent).as("d2"), lit(cb.cid).as("cid"))
    }
    array_min(array(cands: _*)).getField("cid")
  }

  /** Encode: (id, codes array<int>) — map-only, no shuffle. Sub-slices
    * are projected ONCE per subspace before the argmin (inlining the
    * slice into each candidate's distance re-evaluated it ksub times
    * per subspace — the dominant cost of index build at 1M rows). */
  def encode(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
             m: Int, book: Seq[Codebook]): DataFrame = {
    val sub = dim / m
    val v = toDoubleArray(col(vecCol))
    vecs.select(col(idCol).cast("long").as("id") +:
        (0 until m).map(j => slice(v, j * sub + 1, sub).as(s"_s$j")): _*)
      .select(col("id"),
        array((0 until m).map(j =>
          encodeSub(col(s"_s$j"), j, book)): _*).as("codes"))
  }

  /** ADC search: each query's (sub → cid → d2) lookup table is computed
    * driver-side (queries are broadcast-sized by the batch-KNN contract,
    * like centroids) and folded into the plan as LITERAL nested arrays.
    * Scoring is then a pure map-side projection over the codes table —
    * `element_at` lookups summed per gallery row, fully codegen'd, with
    * NO join and NO exchange until the O(Q·k) partial top-k. (The
    * round-1 shape exploded codes and shuffled the full O(N·Q) score
    * matrix through a groupBy — the exact thing ADC exists to avoid.)
    * Returns (query_id, rnk, neighbor_id, dist) with dist the ADC
    * approximation of L2. */
  def searchAdc(codes: DataFrame, queries: DataFrame, qidCol: String,
                vecCol: String, dim: Int, m: Int, book: Seq[Codebook],
                k: Int): DataFrame = {
    val sub = dim / m
    val bySub: Map[Int, Seq[Codebook]] =
      book.groupBy(_.sub).map { case (j, cbs) => j -> cbs.sortBy(_.cid) }
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(qidCol).cast("long"), toDoubleArray(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val perQuery = qRows.map { case (qid, qvec) =>
      // dtab(j): cid -> ||q_sub_j - centroid_{j,cid}||^2, exact driver
      // math. Keyed by cid (not positional) so a codebook with
      // non-contiguous ids — e.g. Lloyd dropped an empty cluster —
      // still looks up correctly.
      val dtab = (0 until m).map { j =>
        map(bySub(j).flatMap { cb =>
          var acc = 0.0
          var i = 0
          while (i < sub) {
            val dd = qvec(j * sub + i) - cb.centroid(i)
            acc += dd * dd; i += 1
          }
          Seq(lit(cb.cid), lit(acc))
        }.toIndexedSeq: _*)
      }
      val adc = (0 until m)
        .map(j => element_at(dtab(j), col("codes").getItem(j)))
        .reduce(_ + _)
      struct(lit(qid).as("query_id"), adc.as("adc"))
    }
    val scored = codes
      .select(col("id").cast("long").as("neighbor_id"),
        explode(array(perQuery.toIndexedSeq: _*)).as("qa"))
      .select(col("qa.query_id"), col("neighbor_id"), col("qa.adc"))
    TopK.perGroup(scored, "query_id", "neighbor_id", "adc", k,
      ascending = true)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        sqrt(col("adc")).as("dist"))
  }
}

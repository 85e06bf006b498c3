package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting, re-expressing the reference's
  * seeded `random.sample` per class (precompute_features.py:152-159) and
  * `random_split` train/val (train_model.py:42-47) as portable-hash
  * order: h(id) = (id * 2654435761) mod 2^31-1 (Knuth multiplicative
  * hash, exact int64 arithmetic in any engine — reproducible everywhere,
  * unlike engine-seeded rand()).
  */
object Sampling {

  /** Portable pseudo-random order key. MOD-FIRST: (id mod p)·c mod p
    * ≡ (id·c) mod p, and the reduced operand (< 2^31) times the Knuth
    * constant (< 2^32) stays under 2^63 — the direct product overflows
    * Long (ANSI error) once ids pass ~3.4e9, which real ingest ids do
    * (the big-SF bench caught exactly this on e11's replicated
    * event_ids). Oracles carry the same mod-first text. */
  def portableHash(id: Column): Column =
    ((id.cast("long") % lit(2147483647L)) * lit(2654435761L)) %
      lit(2147483647L)

  /** k-means++ training-sample bound (v124): the selection runs on
    * the 256·k hash-smallest vectors (k = nlist = 10) — faiss's
    * subsampled-training contract (max_points_per_centroid = 256), so
    * the per-round D² scan is corpus-INDEPENDENT. */
  val KppSampleSize: Int = 2560

  /** The seeded rational threshold of k-means++ selection round `r`
    * (0-based; round 0 picks the uniform first seed): u_r =
    * kppThreshold(r) / 2³¹ ∈ [0, 1) — the portable hash applied to
    * the round counter, the seeded-literal stand-in for k-means++'s
    * PRNG draw. ONE definition: the Spark selection replays it and
    * the oracle SQL interpolates the VALUE, so the draw cannot drift
    * between engines. */
  def kppThreshold(r: Int): Long =
    ((9973L * (r + 1) % 2147483647L) * 2654435761L) % 2147483647L

  /** N-per-class deterministic sample: the n hash-smallest ids per
    * class, through the native partial top-k aggregate — map-side heaps
    * of size n, shuffle O(classes·n·partitions). The previous
    * class-partitioned row_number window put an entire class on ONE
    * task (the d7 skew rule: a dominant class at 100 TB is a straggler
    * and a buffer risk); the aggregate's partial combine never
    * materializes a class anywhere. The hash key (< 2³¹) is exact as
    * the aggregate's double score; (hash, id) is a total order, so the
    * sample and ranks are identical to the window form. idCol must be
    * numeric (it rides the top-k id slot). */
  def perClassSample(df: DataFrame, classCol: String, idCol: String,
                     n: Int): DataFrame = {
    val top = TopK.perGroup(
      df.select(col(classCol), col(idCol),
        portableHash(col(idCol)).cast("double").as("_h")),
      classCol, idCol, "_h", n, ascending = true)
      .select(col(classCol), col(idCol).cast("long").as(idCol), col("rnk"))
    // join back restores the caller's extra columns; the sample side is
    // O(classes·n) by construction — always broadcastable
    df.withColumn(idCol, col(idCol).cast("long"))
      .join(broadcast(top), Seq(classCol, idCol))
  }

  /** Deterministic train/val split: hash-mod bucket. valOneInN=5 → 20%
    * validation, matching the reference's 0.2 split fraction. */
  def hashSplit(df: DataFrame, idCol: String, valOneInN: Int = 5): DataFrame =
    df.withColumn("split",
      when(portableHash(col(idCol)) % valOneInN === 0, lit("val"))
        .otherwise(lit("train")))
}

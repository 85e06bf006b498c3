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

  /** N-per-class deterministic sample: hash-ordered row_number within
    * each class. The window shuffles once on the class key; at scale the
    * per-class partitions stream (no global sort). */
  def perClassSample(df: DataFrame, classCol: String, idCol: String,
                     n: Int): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(portableHash(col(idCol)), col(idCol))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Deterministic train/val split: hash-mod bucket. valOneInN=5 → 20%
    * validation, matching the reference's 0.2 split fraction. */
  def hashSplit(df: DataFrame, idCol: String, valOneInN: Int = 5): DataFrame =
    df.withColumn("split",
      when(portableHash(col(idCol)) % valOneInN === 0, lit("val"))
        .otherwise(lit("train")))
}

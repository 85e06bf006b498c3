package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the approximate scale path for the
  * exact aggregates elsewhere in the library (t7's positional
  * quantiles, v4's exact counts, t5's exact term frequencies).
  *
  * At 100 TB the exact forms pay a full shuffle (or per-group sort);
  * each sketch here is a bounded-size, MERGEABLE summary computed with
  * map-side partial aggregation — the shuffle moves sketches, not rows,
  * and sketches from daily partitions union into monthly rollups
  * without rescanning. All built on Spark's codegen'd built-ins
  * (HyperLogLog++, Apache DataSketches HLL, count-min, GK quantiles) —
  * no UDFs. Error bounds are spec-verified against the exact answers
  * ([[graft.SketchesSpec]]); no DuckDB oracle because approximate
  * results are not bit-portable across engines by design.
  */
object Sketches {

  /** Approximate distinct count per group (HyperLogLog++).
    * `rsd` = target relative standard deviation. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Mergeable DataSketches HLL: per-group sketch BINARIES (union-able
    * across partitions/days with `hll_union_agg`), plus the estimate.
    * The two-level shape (sketch per fine group → union to coarse
    * group) is the pre-aggregation pattern that makes 100 TB rollups
    * cheap. */
  def hllSketches(df: DataFrame, fineCols: Seq[String], valueCol: String,
                  lgConfigK: Int = 12): DataFrame =
    df.groupBy(fineCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("hll"))

  /** Union fine-grained HLL sketches up to a coarser grouping and
    * return the estimated distinct count — no rescan of base data. */
  def hllRollup(sketches: DataFrame, coarseCols: Seq[String],
                sketchCol: String = "hll"): DataFrame =
    sketches.groupBy(coarseCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as("approx_distinct"))

  /** Count-min sketch aggregate for a column (binary, mergeable):
    * answers frequency point-queries with one-sided error ≤ eps·N at
    * the given confidence. A Column (not a DataFrame op): sketches
    * compose inside arbitrary groupBy/agg calls. */
  def countMin(valueCol: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): Column =
    count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))

  /** Approximate per-group quantiles (GK summaries): the sketch twin of
    * the exact positional-selection query. `accuracy` = 1/eps rank
    * error. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, probs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
}

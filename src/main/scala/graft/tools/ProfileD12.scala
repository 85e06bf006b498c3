package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off cost probe for d12_edit_distance: the key's wall-clock is
  * Σ len(ta)·len(tb) over d2's MinHash candidate pairs (the DP-cell
  * count of the Levenshtein verify), so when the driver regenerates
  * testdata the honest first question for any d12 sweep delta is "did
  * the candidate volume move?" — this prints the pair count and the
  * exact cell count for an SF dir (arg 0, default the data-bound
  * replica).
  */
object ProfileD12 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_sfbig"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = graft.queries.Queries.d2MinhashPairs(spark, d)
      .select("a_id", "b_id")
    val ascii = "^[\\x00-\\x7F]*$"
    val t = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .filter(col("text").rlike(ascii))
    val r = t.select(col("doc_id").as("a_id"), col("text").as("ta"))
      .join(pairs, "a_id")
      .join(t.select(col("doc_id").as("b_id"), col("text").as("tb")),
        "b_id")
      .select((length(col("ta")).cast("long") *
        length(col("tb")).cast("long")).as("cost"))
      .agg(count(lit(1)).as("n"), sum("cost").as("lev_cells"))
      .collect()(0)
    println(s"[d12probe] dir=$d pairs=${r.getLong(0)} " +
      s"lev_cells=${r.getLong(1)}")
    spark.stop()
  }
}

package graft.tools

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the SimHash band-bucket size distribution at a given SF —
  * the calibration data for d6's mega-bucket cap and d14's BINDING
  * cap (the d13 recipe needs a cap below the max observed bucket so
  * the guard's drop-the-bucket semantics actually fire under the
  * hash gate). Also prints the distinct-fingerprint (contracted)
  * distribution the d7 spanning-edge path bands over.
  */
object SimhashBucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp = Dedup.simhash(Tables.documents(spark, sfDir), "doc_id", "text")
    val width = 16
    def banded(f: org.apache.spark.sql.DataFrame) = f
      .select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          substring(col("simhash"), b * width + 1, width)): _*))
          .as(Seq("band_idx", "band_val")))
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("bn"))
      .groupBy("bn").agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("bn").desc)
    println("== doc-level band buckets ==")
    banded(fp).show(30, truncate = false)
    val reps = fp.groupBy("simhash")
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "simhash")
    println("n_docs=" + fp.count() + " n_distinct_fp=" + reps.count())
    println("== contracted (distinct-fp) band buckets ==")
    banded(reps).show(30, truncate = false)
    spark.stop()
  }
}

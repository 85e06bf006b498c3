package graft.tools

import graft.operators.IvfIndex
import graft.queries.Queries
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixture probe for the code-store compaction keys (round 13): prints
  * per-shard (n_total, n_dead, flagged) under the v71 rewrite rule for
  * (a) the seed-centroid shards the flat SQ/PQ code stores compact on
  * and (b) the TRAINED coarse lists the IVFPQ store compacts on, at
  * each SF dir given — the v120/v121/v126 specs need BOTH flagged and
  * unflagged shards to exist, and this is the receipt. */
object ProbeCompactShards {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { d =>
      val e = Tables.embeddings(spark, d)
      val seed = IvfIndex.assign(e, e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("embedding")),
        "vec_id", "embedding", "cid")
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("nd"))
        .withColumn("flag", col("nd") * 8 > col("n"))
        .orderBy("centroid_id").collect()
      println(s"== $d seed shards ==")
      seed.foreach(r => println(s"  cid=${r.get(0)} n=${r.get(1)} " +
        s"dead=${r.get(2)} flag=${r.get(3)}"))
      val (merged, _, _, _) = Queries.upsertedIvfpqCodes(spark, d)
      val tr = merged.groupBy("centroid_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("nd"))
        .withColumn("flag", col("nd") * 8 > col("n"))
        .orderBy("centroid_id").collect()
      println(s"== $d trained IVFPQ lists ==")
      tr.foreach(r => println(s"  cid=${r.get(0)} n=${r.get(1)} " +
        s"dead=${r.get(2)} flag=${r.get(3)}"))
    }
    spark.stop()
  }
}

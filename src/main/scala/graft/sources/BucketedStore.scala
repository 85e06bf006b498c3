package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence — the write-once / join-many layout for the
  * gallery at scale. `bucketBy(n, key)` pre-shuffles and pre-sorts data
  * at write time, so every later equi-join or aggregation on the key
  * reads co-located buckets with ZERO exchange: at 100 TB, re-shuffling
  * the gallery for each of a pipeline's joins is the dominant cost, and
  * bucketing pays it exactly once.
  *
  * This is the relational-store twin of the reference's persisted FAISS
  * index (faiss_utils.py:11-17): an access-path decision baked into the
  * storage layout. Complements [[graft.operators.IvfIndex.save]], which
  * partitions by centroid for partition-pruned probes.
  */
object BucketedStore {

  /** Persist `df` as a bucketed (and in-bucket sorted) parquet table in
    * the session catalog. */
  def save(df: DataFrame, table: String, bucketCol: String,
           numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Load a bucketed table; joins/aggs on its bucket key skip the
    * exchange (verify: no `Exchange` below the join in `.explain`). */
  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

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

  /** Build-once accessor: saves `build` bucketed by `bucketCol` unless
    * the table already exists in this session's catalog, then loads it.
    * This is the write-once/join-many contract made explicit — callers
    * (e.g. the incremental-dedup seen index) treat the bucketed layout
    * as a PERSISTED STORE, so repeated query builds in one session are
    * read-only. A warehouse directory orphaned by a previous JVM (the
    * in-memory catalog dies with the session, the files do not) is
    * cleared before the save — resolved from the session's ACTUAL
    * `spark.sql.warehouse.dir` (a relative "spark-warehouse" guess
    * breaks under a non-default warehouse or changed CWD), with a
    * JVM-wide per-table lock so two sessions in one JVM can't race
    * delete-then-save. */
  def ensure(spark: SparkSession, table: String, build: => DataFrame,
             bucketCol: String, numBuckets: Int): DataFrame = {
    val lock = locks.getOrElseUpdate(table, new Object)
    lock.synchronized {
      if (!spark.catalog.tableExists(table)) {
        val warehouse = java.net.URI.create(
          spark.conf.get("spark.sql.warehouse.dir"))
        val root = java.nio.file.Paths.get(
          if (warehouse.getScheme == "file") warehouse.getPath
          else warehouse.toString)
        val dir = root.resolve(table)
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        save(build, table, bucketCol, numBuckets)
      }
    }
    load(spark, table)
  }

  /** Cheap content fingerprint of a source data path (file names,
    * sizes, mtimes — no data read): callers fold this into
    * [[ensure]]'s table name so a source regenerated IN PLACE mints a
    * NEW table instead of silently probing the stale index (the
    * catalog key alone cannot see data changes). 8 hex chars of the
    * tuple hash; a missing path fingerprints as "absent" rather than
    * throwing so the build itself reports the real error. */
  def fingerprint(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      import scala.jdk.CollectionConverters._
      val parts = java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:" +
          java.nio.file.Files.getLastModifiedTime(f).toMillis)
        .toSeq.sorted.mkString("\n")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(parts.getBytes("UTF-8"))
      md.take(4).map("%02x".format(_)).mkString
    }
  }

  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
}

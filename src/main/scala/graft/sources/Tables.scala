package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Each table is a plain parquet file; reads go through the DataFrame
  * reader so Catalyst pushes filters and prunes columns at the scan
  * (verify with `.explain`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    ensureParallelism(df, Some(path))
  }

  /** Scan partition count per path, probed once per JVM: the probe
    * (`df.rdd.getNumPartitions`) forces eager physical planning, so
    * paying it on EVERY load would re-plan the scan per table reference
    * in a query. */
  private val scanParts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The testdata files are single-row-group parquet, which Spark reads
    * as ONE partition — every narrow (per-row) stage would run on one
    * core. Spread to the cluster's parallelism when the scan is under-
    * partitioned; a real multi-split table (anything at production
    * scale) already has ≥ cores partitions and this is a no-op, so no
    * extra shuffle is paid at 100 TB. */
  def ensureParallelism(df: DataFrame,
                        cacheKey: Option[String] = None): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = cacheKey match {
      case Some(k) => scanParts.computeIfAbsent(k,
        _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue()
      case None => df.rdd.getNumPartitions
    }
    if (parts < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Events with `ts` NORMALIZED to exact nanosecond Longs regardless
    * of how the parquet encodes it. The driver's generator has shipped
    * the column both as TIMESTAMP(NANOS) (read as Long under
    * `nanosAsLong`) and as timestamp[us] (read as TIMESTAMP_NTZ) —
    * every downstream operator does exact integer time math on ns (a
    * 1.7e18 ns epoch exceeds double's 2^53 exact range, so timestamp
    * arithmetic must never round-trip through floats). µs → ns is the
    * exact multiply by 1000; the NTZ cast is naive-UTC under the
    * session's pinned UTC zone, matching DuckDB's epoch_us on the same
    * naive column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.LongType
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

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
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

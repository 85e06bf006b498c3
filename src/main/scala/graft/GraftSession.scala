package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** Canonical session factory for the graft engine: registers the native
  * expressions and applies the configuration every entry point (Verify,
  * Bench, tests, user code) needs.
  */
object GraftSession {

  /** Pre-configured builder; caller picks master/app specifics. */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      // events-style tables carry TIMESTAMP(NANOS) parquet, which Spark
      // has no timestamp type for — surface as Long nanos.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")

  /** Local session sized for this container (tests / local runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s) // effective even if an earlier session won getOrCreate
    s
  }
}

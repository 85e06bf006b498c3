package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. First line of defense at scale is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) which splits
  * oversized shuffle partitions at runtime; this helper covers the cases
  * AQE can't touch — e.g. a shuffled join feeding a stateful op, or an
  * engine running with AQE off — by pre-spreading each hot key across
  * `buckets` reducers with a deterministic salt.
  */
object Skew {

  /** Salted inner equi-join. The probe (large, skewed) side gets a
    * deterministic per-row salt; the build side is replicated once per
    * salt bucket, so a single hot key fans out over `buckets` tasks.
    * Row-identical to `probe.join(build, keys)` — only the physical
    * distribution changes. Build-side replication costs
    * `buckets × |build|`, so keep `build` the smaller input. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}

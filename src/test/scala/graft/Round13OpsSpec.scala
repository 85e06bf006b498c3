package graft

import java.nio.file.{Files, Paths}

import graft.queries.Queries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 gates: code-store compaction execution (v120/v121/v126).
  * The CompactionSpec contract applied to the three code-store
  * families: the rewrite must purge EXACTLY the over-threshold shards,
  * leave every other shard's files bit-identical, leave NO shard above
  * the v71 threshold (the invariant the v106-family serve hints
  * broadcast under), and change nothing a query can observe. */
class Round13OpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def listPartDirs(p: String): Map[String, Seq[String]] =
    Files.list(Paths.get(p)).iterator().asScala
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("centroid_id="))
      .map(d => d.getFileName.toString ->
        Files.list(d).iterator().asScala.map(_.getFileName.toString)
          .toSeq.sorted)
      .toMap

  /** The shared rewrite assertions for one compacted code store:
    * `serve` must have been run (it builds both layouts). */
  private def assertCompacted(tag: String): Unit = {
    val (srcPath, cmpPath) = Queries.codeCompactionPaths(sf, tag)
    val src = spark.read.parquet(srcPath)
    val dst = spark.read.parquet(cmpPath)
    val dead = col("id") % 7 === 0

    // recompute the v71 rule on the SOURCE store: that set must be
    // exactly the purged one
    val flagged = src.groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(dead, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n"))
      .select("cid").collect().map(_.getLong(0)).toSet
    val srcParts = listPartDirs(srcPath)
    assert(flagged.nonEmpty, s"$tag: fixture flagged no shard — the " +
      "purge path went untested")
    assert(flagged.size < srcParts.size, s"$tag: fixture flagged every " +
      "shard — the copy path went untested")

    val dstParts = listPartDirs(cmpPath)
    assert(srcParts.keySet == dstParts.keySet,
      s"$tag: compacted store lost or invented shards")

    // unflagged shards: same file names, bit-identical bytes
    val flaggedDirs = flagged.map(c => s"centroid_id=$c")
    (srcParts.keySet -- flaggedDirs).foreach { dir =>
      assert(srcParts(dir) == dstParts(dir),
        s"$tag/$dir: file set changed")
      srcParts(dir).foreach { f =>
        assert(Files.mismatch(Paths.get(srcPath, dir, f),
          Paths.get(cmpPath, dir, f)) == -1L,
          s"$tag/$dir/$f: bytes differ — unflagged shard was rewritten")
      }
    }

    // flagged shards: zero tombstoned rows, every live row kept
    val inFlagged = col("centroid_id").cast("long")
      .isin(flagged.toSeq: _*)
    assert(dst.filter(inFlagged && dead).count() == 0L,
      s"$tag: a flagged shard still holds tombstoned rows")
    val wantIds = src.filter(inFlagged && !dead)
      .select("id").collect().map(_.getLong(0)).toSet
    val gotIds = dst.filter(inFlagged)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds == wantIds, s"$tag: flagged-shard rewrite dropped " +
      "or invented live rows")

    // THE gated invariant: after the rewrite, NO shard of the
    // compacted store is above the v71 threshold — the bound the
    // maintenance serves' broadcast(tombstone) hints rely on
    val over = dst.groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(dead, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n")).count()
    assert(over == 0L, s"$tag: $over shard(s) of the compacted store " +
      "still exceed the 12.5% threshold — the serve-time bound is " +
      "not enforced")
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toSet

  test("v120: SQ8 compacted serve == v109 maintenance serve, and the " +
    "rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v120SqCompaction(spark, sf))
    val want = rows(Queries.v109SqMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("sqcmp")
  }

  test("v121: IVFPQ compacted serve == v110 maintenance serve, and " +
    "the rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v121IvfpqCompaction(spark, sf))
    val want = rows(Queries.v110IvfpqMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("ivfpqcmp")
  }

  test("v126: trained-PQ compacted serve == v106 maintenance serve, " +
    "and the rewrite honors the CompactionSpec contract") {
    val got = rows(Queries.v126PqCompaction(spark, sf))
    val want = rows(Queries.v106StoreMaintenance(spark, sf))
    assert(got == want)
    assert(got.nonEmpty)
    assertCompacted("pqcmp")
  }

  test("flat code stores compact on v71's shards: the executed flag " +
    "set IS the planner's decision") {
    // builds are idempotent (ensurePersisted); the serve tests above
    // may or may not have run yet, so force the build here
    Queries.v120SqCompaction(spark, sf).collect()
    val (srcPath, _) = Queries.codeCompactionPaths(sf, "sqcmp")
    val got = spark.read.parquet(srcPath)
      .groupBy(col("centroid_id").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("nd"))
      .filter(col("nd") * 8 > col("n"))
      .select("cid").collect().map(_.getLong(0)).toSet
    val want = Queries.v71CompactionReport(spark, sf)
      .filter(col("needs_compaction") === 1L)
      .select(col("centroid_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(got == want,
      s"sq store flags $got but v71's planner decided $want")
  }
}

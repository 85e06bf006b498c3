package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest for the reference's gallery-metadata JSON shape
  * (train_val.json: {"train": [[label, path], ...], "categories":
  * [...]}; see reference precompute_features.py:136-159 and the
  * features_paths.json it emits at :192-213).
  *
  * Spark-first: `spark.read.json` + explode, producing the relational
  * (label, path, category) table every metadata join in the engine uses.
  * The categories array is tiny → folded in via posexplode + join
  * (broadcast by size).
  */
object GalleryMetadata {

  /** Read {"train": [[label, path]...], "categories": [...]} into
    * (label: Long, path: String, category: String). */
  def read(spark: SparkSession, jsonPath: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(jsonPath)
    val items = raw.select(explode(col("train")).as("pair"))
      .select(
        element_at(col("pair"), 1).cast("long").as("label"),
        element_at(col("pair"), 2).as("path"))
    val cats = raw.select(posexplode(col("categories")).as(Seq("label", "category")))
      .select(col("label").cast("long").as("label"), col("category"))
    items.join(broadcast(cats), Seq("label"), "left")
  }

  /** Just the (label, category) dim from the same JSON shape — the
    * categories array indexed by label (precompute_features.py:147-159).
    * Tiny by definition: always the broadcast side of metadata joins. */
  def readCategories(spark: SparkSession, jsonPath: String): DataFrame =
    spark.read.option("multiLine", "true").json(jsonPath)
      .select(posexplode(col("categories")).as(Seq("label", "category")))
      .select(col("label").cast("long").as("label"), col("category"))
}

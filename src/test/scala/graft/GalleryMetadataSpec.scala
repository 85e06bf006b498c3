package graft

import graft.sources.GalleryMetadata
import org.apache.spark.sql.functions._

class GalleryMetadataSpec extends SparkSpec {
  import spark.implicits._

  test("reads the reference gallery-metadata JSON shape") {
    val m = GalleryMetadata.read(spark, "/root/reference/train_val.json")
    assert(m.columns.toSeq === Seq("label", "path", "category"))
    assert(m.count() === 9144)
    val r = m.filter($"label" === 1).select("category").distinct()
      .as[String].collect().toSeq
    assert(r === Seq("BACKGROUND_Google"))
    // every item resolves a category
    assert(m.filter($"category".isNull).count() === 0)
  }
}

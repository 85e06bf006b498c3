package graft

import graft.multimodal.BinaryPipeline
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello"), (2L, "spark engine"))
    .toDF("doc_id", "text")

  test("toAssets produces typed binary metadata") {
    val a = BinaryPipeline.toAssets(docs, "doc_id", "text")
    assert(a.schema.fieldNames.toSeq ===
      Seq("asset_id", "payload", "mime", "n_bytes", "sha256"))
    val m = a.select($"asset_id", $"n_bytes", $"sha256")
      .as[(Long, Long, String)].collect()
    val byId = m.map(x => x._1 -> ((x._2, x._3))).toMap
    assert(byId(1L)._1 === 5L)
    // known sha256("hello")
    assert(byId(1L)._2 ===
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("decodeStub emits deterministic fixed-dim features") {
    val a = BinaryPipeline.toAssets(docs, "doc_id", "text")
    val f = BinaryPipeline.decodeStub(a, featureDim = 4)
    val rows = f.select($"asset_id", $"features").as[(Long, Seq[Double])]
      .collect().toMap
    assert(rows(1L).length === 4)
    // "hello" bytes 104,101,108,108,111 strided into 4 dims:
    // d0: (104+111)/2, d1: 101, d2: 108, d3: 108
    assert(rows(1L) === Seq(107.5, 101.0, 108.0, 108.0))
    val again = BinaryPipeline.decodeStub(a, featureDim = 4)
      .select($"asset_id", $"features").as[(Long, Seq[Double])].collect().toMap
    assert(again === rows)
  }
}

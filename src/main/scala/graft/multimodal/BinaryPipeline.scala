package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, mirroring the reference's image
  * ingest (utils/image_utils.py:5-15 preprocess → utils/precompute_
  * features.py:167-180 batch feature extraction), re-expressed as a
  * batch DataFrame pass.
  *
  * The actual codec call is STUBBED (`decodeStub`) — no image libraries
  * ship in this container — but everything Spark-side is real: the
  * schema, the partition-parallel batch shape (mapPartitions over
  * iterator batches, the Scala twin of `mapInPandas`), and deterministic
  * fake features so tests and oracles stay exact.
  */
object BinaryPipeline {

  /** Typed metadata schema for a multimodal asset column. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("sha256", StringType, nullable = true)))

  /** Wrap a text column as an opaque binary payload + typed metadata —
    * the ingest surface a real image table would have. Pure codegen'd
    * built-ins (no UDF). */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      sha2(col(textCol).cast("binary"), 256).as("sha256"))

  /** Input/output records of the decode boundary — Tungsten product
    * encoders, so the object round-trip is codegen'd serialization, not
    * per-row `Row` boxing. */
  case class AssetPayload(asset_id: Long, payload: Array[Byte])
  case class AssetFeatures(asset_id: Long, features: Array[Double])

  /** STUB decode: where a real pipeline would decode pixels and run the
    * embedding model (reference model.py:51-58), we emit deterministic
    * per-payload statistics from the raw bytes.
    *
    * Execution shape: a typed `Dataset.mapPartitions` — the Scala twin
    * of `mapInPandas`, and the plug-in point where a real
    * decoder/feature-extractor (batched, per-partition library init)
    * drops in unchanged. Only (asset_id, payload) crosses the object
    * boundary (column pruning reaches the scan); metadata re-joins by
    * asset_id downstream. */
  def decodeStub(assets: DataFrame, featureDim: Int = 8): DataFrame =
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as(Encoders.product[AssetPayload])
      .mapPartitions(_.map(a =>
        AssetFeatures(a.asset_id, strideMeans(a.payload, featureDim))))(
        Encoders.product[AssetFeatures])
      .toDF()

  /** Deterministic fake "embedding": dim-strided byte averages. Exact
    * integer sums (< 2^53) with one IEEE division per dim, so the SQL
    * oracle replicates it bit-for-bit. */
  private def strideMeans(bytes: Array[Byte], featureDim: Int): Array[Double] =
    if (bytes == null) null
    else {
      val acc = new Array[Double](featureDim)
      val cnt = new Array[Long](featureDim)
      var i = 0
      while (i < bytes.length) {
        val d = i % featureDim
        acc(d) += (bytes(i) & 0xff); cnt(d) += 1; i += 1
      }
      var d = 0
      while (d < featureDim) {
        if (cnt(d) > 0) acc(d) = acc(d) / cnt(d); d += 1
      }
      acc
    }
}

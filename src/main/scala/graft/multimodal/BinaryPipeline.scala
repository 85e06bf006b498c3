package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
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

  /** STUB decode: where a real pipeline would decode pixels and run the
    * embedding model (reference model.py:51-58), we emit deterministic
    * per-payload statistics from the raw bytes. Runs partition-parallel
    * over iterator batches — the execution shape a real
    * decoder/feature-extractor plugs into unchanged. */
  def decodeStub(assets: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(assets.schema.fields.toSeq :+
      StructField("features", ArrayType(DoubleType), nullable = true))
    val payloadIdx = assets.schema.fieldIndex("payload")
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val feats: Array[Double] =
          if (bytes == null) null
          else {
            // deterministic fake "embedding": dim-strided byte averages
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
        Row.fromSeq(row.toSeq :+ (feats: Any))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

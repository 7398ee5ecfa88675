package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus batched decode/feature-extract
  * plumbing.
  *
  * The heavy decode step (image decode, resampling, frame sampling) is
  * STUBBED with a deterministic fake — the decode libraries are not in
  * this container — but the Spark-side contract is real and tested:
  * schema, partition-parallel batch processing via `mapPartitions`, and
  * the metadata struct shape a 100 TB media pipeline needs. Swapping the
  * stub for a real decoder changes one function body, not the plumbing.
  */
object Multimodal {

  val MetadataType: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  /** Wrap a value column as an opaque binary payload + typed metadata —
    * the canonical multimodal row shape (payload stays opaque to SQL;
    * metadata is columnar and filterable/pushdown-friendly).
    */
  def asPayload(df: DataFrame, valueCol: String, modality: String): DataFrame =
    df.withColumn("payload", encode(col(valueCol), "UTF-8"))
      .withColumn("meta", struct(
        lit(modality).as("modality"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_hash")))

  final case class Feature(width: Int, height: Int, channels: Int, featureNorm: Double)

  /** STUB decode: a real implementation would decode the payload
    * (image/audio codec) here. The deterministic fake derives pseudo
    * dimensions from the payload hash so tests exercise the full
    * distributed path with stable outputs.
    */
  private def decodeStub(payload: Array[Byte]): Feature = {
    val h = java.util.Arrays.hashCode(payload)
    Feature(
      width = 64 + math.abs(h % 193),
      height = 64 + math.abs((h / 193) % 193),
      channels = 3,
      featureNorm = (math.abs(h) % 10000) / 100.0)
  }

  /** Batched per-partition decode/feature-extract — the Scala analogue of
    * an Arrow-batched decode UDF: one decoder instantiation per
    * partition, rows streamed through it, output schema declared up
    * front. This is where a real codec/library handle would live.
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("feature_norm", DoubleType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = ensureParallelism(df).rdd.mapPartitions { rows =>
      // per-partition decoder init would happen here
      rows.map { r =>
        val f = decodeStub(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), f.width, f.height, f.channels, f.featureNorm)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

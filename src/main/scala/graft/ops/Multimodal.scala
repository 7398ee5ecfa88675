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

  /** STUB resize: a real implementation would decode, scale to
    * `targetW`×`targetH`, and re-encode. The fake derives the output
    * bytes deterministically from (input hash, target dims) so the
    * plumbing — payload in, payload out, metadata recomputed — is
    * exercised end-to-end with stable results.
    */
  private def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val h = java.util.Arrays.hashCode(payload)
    // fake "resized" bytes: size proportional to target area, content
    // seeded by the input hash — distinct inputs stay distinct
    val out = new Array[Byte](math.max(16, targetW * targetH / 64))
    var x = h.toLong * 6364136223846793005L + targetW * 1442695040888963407L + targetH
    var i = 0
    while (i < out.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 56).toByte
      i += 1
    }
    out
  }

  /** Resize transform: payload → payload (same row count), metadata
    * recomputed from the new bytes. Runs per-partition like
    * `extractFeatures`; swapping `resizeStub` for a real scaler is the
    * only change a production pipeline needs.
    */
  def resize(df: DataFrame, idCol: String, targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = ensureParallelism(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val resized = resizeStub(r.getAs[Array[Byte]](payloadIdx), targetW, targetH)
        Row(r.getLong(idIdx), resized, targetW, targetH)
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .withColumn("meta", struct(
        lit("image").as("modality"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_hash")))
  }

  /** Frame sampling: one video payload row → `nFrames` frame rows
    * (frame_idx, frame payload, timestamp offset). The decode is the
    * deterministic stub; the row-exploding shape — flatMap over
    * partitions, output schema declared, frame count bounded — is the
    * real contract a video pipeline needs. Output rows = input × nFrames,
    * partition-parallel, never materialized per-video on the driver.
    */
  def frameSample(df: DataFrame, idCol: String, nFrames: Int, fps: Double = 30.0): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_ms", LongType),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = ensureParallelism(df).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val id = r.getLong(idIdx)
        // stub "duration": derived from payload size, ≥ nFrames frames
        val totalFrames = math.max(nFrames, payload.length / 8)
        val stride = totalFrames / nFrames
        Iterator.tabulate(nFrames) { i =>
          val frameNo = i * stride
          Row(id, i, (frameNo * 1000 / fps).toLong,
            resizeStub(payload :+ frameNo.toByte, 32, 32))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
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

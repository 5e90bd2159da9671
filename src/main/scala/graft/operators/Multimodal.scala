package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media bytes are an opaque `BinaryType` column with a typed metadata
  * struct riding alongside — the schema a 100 TB multimodal corpus actually
  * uses (content-addressed blobs + structured metadata, never decoded
  * strings). The Spark-side plumbing — schema, partition-friendly layout,
  * per-partition batch iteration — is real and tested; the codec itself is a
  * clearly marked deterministic STUB (this container has no image/audio
  * libraries; swap [[StubCodec.decode]] for a real decoder binding and
  * nothing else changes).
  *
  * The Scala-native analogue of a Pandas-batched UDF is `mapPartitions` over
  * a typed Dataset: one JVM object stream per partition, codec state
  * amortized across the partition (decoders are expensive to construct —
  * exactly why the batch shape matters).
  */
object Multimodal {

  /** (content, meta) schema for a media column. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  final case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class DecodedRow(media_id: Long, format: String, width: Int,
                              height: Int, n_frames: Int, n_bytes: Long)

  /** STUB codec — deterministic fake in place of a real image/audio decoder.
    * Derives plausible metadata purely from the bytes so tests are stable.
    * A real deployment replaces this object with e.g. a JNI codec binding.
    *
    * The fake metadata is a pure function of md5(bytes) — 28 bits parsed from
    * the first 7 hex chars — so any engine with an md5 function can reproduce
    * it exactly (the driver's DuckDB oracle does).
    */
  object StubCodec {
    val Formats = Vector("jpeg", "png", "webp", "wav")
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 7), 16) // 28 bits, ≥ 0
      MediaMeta(
        format = Formats((h % Formats.size).toInt),
        width = 64 + (h % 1024).toInt,
        height = 64 + ((h / 1024) % 1024).toInt,
        n_frames = 1 + (n % 256))
    }
  }

  /** Synthesize a media table from any table with an id + string column —
    * the bytes are the UTF-8 encoding (real binary plumbing, fake media). */
  def syntheticMediaTable(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
                encode(col(textCol), "UTF-8").as("content"))

  /** Decode pass: `mapPartitions` over the typed rows — the batched-UDF
    * shape. Partition-local codec reuse; output is columnar-friendly. */
  def decodeAll(media: DataFrame): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[MediaRow]
      .mapPartitions { rows =>
        // (a real codec would be constructed once here, per partition)
        rows.map { r =>
          val m = StubCodec.decode(r.content)
          DecodedRow(r.media_id, m.format, m.width, m.height, m.n_frames,
                     r.content.length.toLong)
        }
      }
  }

  /** Pure-column metadata pass (no decode): byte length + stable content
    * digest — the cheap scan that partitions/filters a 100 TB corpus before
    * any decoder runs. */
  def byteStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
                 length(col("content")).cast("long").as("n_bytes"),
                 md5(col("content")).as("digest"))

  /** Frame sampling plan for a decoded video row: every `stride`-th frame
    * index, capped at `maxFrames`. Pure column expression over metadata —
    * the decoder only ever extracts the planned frames. */
  def frameSamplePlan(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded.withColumn("frame_plan",
      slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))

  /** Deterministic resize plan: target box fit preserving aspect ratio
    * (integer math only). The STUB stand-in for an actual resample kernel. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scaleNum = lit(maxSide)
    val longSide = greatest(col("width"), col("height"))
    val needs = longSide > maxSide
    decoded
      .withColumn("out_width",
        when(needs, (col("width") * scaleNum / longSide).cast("int")).otherwise(col("width")))
      .withColumn("out_height",
        when(needs, (col("height") * scaleNum / longSide).cast("int")).otherwise(col("height")))
  }
}

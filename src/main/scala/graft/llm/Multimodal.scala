package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` columns plus typed metadata structs.
  *
  * The Spark-side shape is the real thing — binary columns, metadata
  * extraction as codegen'd expressions, and batched per-partition decode
  * with an explicit batch size (the Scala analog of an Arrow-vectorized
  * decode UDF). The pixel/sample math itself is STUBBED with deterministic
  * fakes: this container ships no image/audio codecs, so `decodeBatch`
  * marks exactly where libjpeg/ffmpeg calls would go. Swapping the stub for
  * a real decoder changes no plan shape, schema, or partitioning.
  */
object Multimodal {

  /** Metadata schema carried alongside every media binary. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("checksum", LongType)))

  val DecodedImageType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Container sniffing from magic bytes — pure expression, no decode.
    * (JPEG FF D8, PNG 89 50 4E 47, GIF 47 49 46, RIFF=WAV/AVI, 'ftyp'=MP4.) */
  def mediaType(bin: Column): Column = {
    val head = upper(hex(substring(bin, 1, 8)))
    when(head.startsWith("FFD8"), "image/jpeg")
      .when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("474946"), "image/gif")
      .when(head.startsWith("52494646"), "audio/wav")
      .when(substring(bin, 5, 4).cast(StringType) === "ftyp", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Metadata struct (type, length, checksum) — shuffle-free annotation. */
  def mediaMeta(bin: Column): Column =
    struct(
      mediaType(bin).as("media_type"),
      length(bin).cast(LongType).as("byte_len"),
      xxhash64(bin).as("checksum"))

  def withMediaMeta(df: DataFrame, binCol: String, metaCol: String = "media_meta"): DataFrame =
    df.withColumn(metaCol, mediaMeta(col(binCol)))

  /** Deterministic feature embedding of a binary column: `dim` floats
    * derived from per-dimension hashes. A real model-based extractor slots
    * into the same (binary -> array<float>) signature. */
  def featureEmbedding(bin: Column, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bin, i), lit(2000001L)).cast(DoubleType) / 1000000.0 - 1.0)
        .cast(FloatType))

  /** Frame sampling for "video" binaries: k evenly-spaced fixed-width byte
    * slices as an array<binary> — the plan shape of keyframe extraction
    * (slice offsets are where a demuxer would seek). */
  def sampleFrames(bin: Column, frames: Int = 4, frameBytes: Int = 256): Column = {
    val len = length(bin)
    transform(sequence(lit(0), lit(frames - 1)), k => {
      val offset = (len * k / frames) + 1
      substring(bin, offset, lit(frameBytes)).cast(BinaryType)
    })
  }

  /** Batched per-partition image decode — the Scala analog of a vectorized
    * decode UDF. Rows stream through in `batchSize` groups (bounding
    * decoder memory exactly like an Arrow batch would); output schema is
    * the input plus a `decoded` struct.
    *
    * STUB: `decodeOne` fabricates dimensions deterministically from the
    * checksum where a real codec (ImageIO/libjpeg) would parse the bytes.
    */
  def decodeImages(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("decoded", DecodedImageType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // A real implementation hands the whole batch to the codec here.
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          Row.fromSeq(row.toSeq :+ decodeOne(bytes))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** STUB decoder: deterministic fake (width/height/channels/intensity from
    * the content hash). Replace the body with a real codec call; signature
    * and batching stay identical. */
  private def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) Row(0, 0, 0, 0.0)
    else {
      var h = 0L
      bytes.foreach(b => h = h * 31L + (b & 0xFF))
      val width = 64 + math.floorMod(h, 1024L).toInt
      val height = 64 + math.floorMod(h >> 10, 1024L).toInt
      val channels = 1 + math.floorMod(h >> 20, 4L).toInt
      val intensity = math.floorMod(h >> 22, 256L).toDouble / 255.0
      Row(width, height, channels, intensity)
    }
  }

  /** Resize planning (STUB math, real plan shape): target dims preserving
    * aspect ratio, as a column over the decoded struct. */
  def resizePlan(decoded: Column, maxSide: Int = 512): Column = {
    val w = decoded("width").cast(DoubleType)
    val h = decoded("height").cast(DoubleType)
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h, lit(1.0)))
    struct(
      round(w * scale).cast(IntegerType).as("width"),
      round(h * scale).cast(IntegerType).as("height"))
  }
}

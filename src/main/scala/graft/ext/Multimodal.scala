package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with a typed metadata struct, plus per-partition
  * batched "decode"/feature-extraction (north-star extension, SURVEY §7.6).
  *
  * The decode step is a STUB: no codec libraries ship in this container, so
  * [[fakeDecode]] derives deterministic pseudo-features from the bytes. The
  * Spark-side plumbing — schema, partitioning, mapPartitions batch shape,
  * spill-free accumulation — is real and is what carries over to a real
  * decoder: swap `decodeBatch`'s body for the codec call, nothing else moves.
  *
  * Scale notes: decode runs via `mapPartitions` (one iterator pass per
  * partition, constant memory), the idiomatic Scala analog of Python's
  * `mapInPandas`; payload columns are pruned until the decode stage so the
  * scan ships only (id, media, media_type).
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Wraps a text column as a binary media payload with metadata — the
    * ingest shape a real pipeline would read from object storage.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit(mediaType).as("media_type"),
        length(encode(col(payloadCol), "UTF-8")).cast("long").as("byte_len"),
        xxhash64(col(payloadCol)).as("checksum")).as("meta"))

  /** Deterministic stand-in for a codec: derives (width, height, n_frames)
    * and an 8-dim feature vector from the raw bytes. Replace with a real
    * decoder when codec libs are available — signature stays identical.
    */
  private[ext] def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val n = bytes.length
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val frames = 1 + math.floorMod(h >> 20, 32).toInt
    val feat = Array.tabulate(8) { i =>
      val slice = bytes.iterator.zipWithIndex.filter(_._2 % 8 == i).map(_._1 & 0xff)
      if (n == 0) 0.0 else slice.sum.toDouble / math.max(1, (n + 7 - i) / 8)
    }
    (width, height, frames, feat)
  }

  /** Batched decode/feature extraction over (id, media, meta) rows. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val input = media.select(
      col("id"), col("media"), col("meta").getField("media_type").as("media_type"),
      col("meta").getField("byte_len").as("byte_len"))
    val out: Dataset[Row] = input.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val (w, h, f, feat) = fakeDecode(bytes)
        Row(r.getAs[Long]("id"), r.getAs[String]("media_type"),
          r.getAs[Long]("byte_len"), w, h, f, feat.toSeq)
      }
    }(enc)
    out
  }

  /** End-to-end: text table → media payloads → decoded feature table. */
  def featurize(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    decodeFeatures(asMedia(df, idCol, payloadCol, mediaType))

  // ---- REAL (codec-free) PNG IHDR construction + parsing ----------------
  // A PNG file's dimensions live at FIXED byte offsets — signature (8
  // bytes), IHDR chunk length + type (8), then big-endian width and height
  // (4 each) — so the metadata-extraction stage of a multimodal pipeline
  // needs no image library at all: it is pure byte slicing, expressed here
  // as fully codegen'd column expressions (substring/hex/conv on
  // BinaryType). Only decode-to-pixels remains behind the [[fakeDecode]]
  // stub; header-level audit (dims, signature check) — the pass a 100 TB
  // ingest runs BEFORE paying for decode — is real.

  /** Serializes a valid 29-byte PNG signature + IHDR prefix for the given
    * dimensions (bit depth 8, RGBA, standard compression/filter, no
    * interlace; CRC omitted — readers locate dims positionally).
    */
  def pngHeader(width: Column, height: Column): Column =
    concat(
      unhex(lit("89504E470D0A1A0A")), // PNG signature
      unhex(lit("0000000D49484452")), // IHDR length=13 + "IHDR"
      unhex(lpad(hex(width), 8, "0")), // big-endian u32 width
      unhex(lpad(hex(height), 8, "0")), // big-endian u32 height
      unhex(lit("0806000000"))) // depth/color/compression/filter/interlace

  /** Big-endian u32 width at byte offset 16 (1-based 17). */
  def pngWidth(media: Column): Column =
    conv(hex(substring(media, 17, 4)), 16, 10).cast("long")

  /** Big-endian u32 height at byte offset 20 (1-based 21). */
  def pngHeight(media: Column): Column =
    conv(hex(substring(media, 21, 4)), 16, 10).cast("long")

  /** True iff the payload starts with the 8-byte PNG signature. */
  def pngSigOk(media: Column): Column =
    hex(substring(media, 1, 8)) === lit("89504E470D0A1A0A")

  /** Resize stage (metadata math; a real pipeline would also transform the
    * pixel payload here): fit (width, height) inside (maxW, maxH)
    * preserving aspect ratio. Pure column arithmetic — no shuffle.
    */
  // ---- WAV/RIFF audio headers: PNG's counterpart for the audio
  // modality, with the opposite byte order — RIFF integers are
  // LITTLE-endian, so serialize/parse go through an explicit per-byte
  // swap instead of PNG's straight hex. Same contract as the PNG
  // helpers: fully codegen'd column expressions over BinaryType; only
  // sample decode stays behind the declared stub.

  /** Little-endian unsigned integer serializer: `n` bytes, low byte
    * first (the RIFF/WAV on-disk layout).
    */
  private def leBytes(v: Column, n: Int): Column =
    concat((0 until n).map(i =>
      unhex(lpad(hex(pmod(shiftright(v, 8 * i), lit(256L))), 2, "0"))): _*)

  /** Little-endian unsigned integer parser: `n` bytes at 1-based byte
    * offset `off1`, low byte first.
    */
  private def leParse(media: Column, off1: Int, n: Int): Column =
    conv(concat((0 until n).reverse.map(i =>
      lpad(hex(substring(media, off1 + i, 1)), 2, "0")): _*), 16, 10)
      .cast("long")

  /** Serializes a valid 44-byte PCM WAV header (RIFF + fmt + data chunk
    * headers; 16-bit samples; declared payload = one second of audio,
    * payload bytes omitted — readers locate every field positionally).
    */
  def wavHeader(channels: Column, sampleRate: Column): Column = {
    val blockAlign = channels * lit(2L) // 16-bit PCM
    val byteRate = sampleRate * blockAlign
    val dataSize = byteRate // one declared second
    concat(
      lit("RIFF".getBytes("US-ASCII")),
      leBytes(lit(36L) + dataSize, 4),
      lit("WAVEfmt ".getBytes("US-ASCII")),
      leBytes(lit(16L), 4), // fmt chunk size
      leBytes(lit(1L), 2), // PCM
      leBytes(channels, 2),
      leBytes(sampleRate, 4),
      leBytes(byteRate, 4),
      leBytes(blockAlign, 2),
      leBytes(lit(16L), 2), // bits per sample
      lit("data".getBytes("US-ASCII")),
      leBytes(dataSize, 4))
  }

  /** True iff the payload carries the RIFF....WAVE container magic. */
  def wavRiffOk(media: Column): Column =
    hex(substring(media, 1, 4)) === lit("52494646") &&
      hex(substring(media, 9, 4)) === lit("57415645")

  /** u16le channel count at byte offset 22 (1-based 23). */
  def wavChannels(media: Column): Column = leParse(media, 23, 2)

  /** u32le sample rate at byte offset 24 (1-based 25). */
  def wavSampleRate(media: Column): Column = leParse(media, 25, 4)

  /** u32le byte rate at byte offset 28 (1-based 29). */
  def wavByteRate(media: Column): Column = leParse(media, 29, 4)

  /** u32le data-chunk size at byte offset 40 (1-based 41). */
  def wavDataSize(media: Column): Column = leParse(media, 41, 4)

  def resizeMeta(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"))
    features
      .withColumn("resized_width", floor(col("width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling stage: up to `k` frame indices, evenly spaced over
    * [0, n_frames) — the standard video keyframe-selection shape.
    */
  def sampleFrames(features: DataFrame, k: Int): DataFrame =
    features.withColumn(
      "frame_idx",
      when(col("n_frames") <= k,
        sequence(lit(0), col("n_frames") - 1))
        .otherwise(transform(
          sequence(lit(0), lit(k - 1)),
          i => (i * col("n_frames") / k).cast("int"))))
}

package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as a partition-parallel typed operator.
  *
  * Media codec libraries are not available in this environment, so the
  * payload is a synthesized container format (`GFT1`) rather than a real
  * JPEG/WAV — but the *decode is real*: [[decodeMeta]] parses the binary
  * header (magic check, little-endian fields) with a ByteBuffer, exactly
  * the shape a JNI/FFmpeg binding takes (bytes in → typed struct out,
  * one decoder context per partition). A wrong offset or endianness in
  * either the encoder or the parser breaks the oracle match — the
  * correctness check exercises real byte-level structure, not a mirrored
  * formula.
  *
  * Container layout (14-byte header, little-endian):
  * {{{
  *   0  4  magic "GFT1"
  *   4  4  u32 width
  *   8  4  u32 height
  *   12 2  u16 n_frames
  *   14 .. media bytes
  * }}}
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  val HeaderLen = 14
  private val Magic = "GFT1"

  /** Little-endian hex rendering of the low `nBytes` bytes of an int
    * column — codegen'd string ops, no UDF. */
  private def leHex(c: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      format_string("%02x", pmod(shiftright(c, 8 * i), lit(256)))): _*)

  /** Synthesize the GFT1 container for a text row: header fields derived
    * from the content (length, first/last byte), media payload = the
    * utf-8 bytes themselves. Stand-in for real media blobs that keeps
    * every byte meaningful. */
  def encodePayload(text: Column): Column = {
    val bytes = text.cast("binary")
    val width = lit(640) + pmod(octet_length(bytes), lit(128))
    val height = lit(360) + pmod(ascii(text), lit(72))
    val frames = lit(1) + pmod(ascii(substring(text, -1, 1)), lit(30))
    concat(
      unhex(concat(
        lit(Magic.getBytes(StandardCharsets.US_ASCII).map("%02x".format(_)).mkString),
        leHex(width, 4), leHex(height, 4), leHex(frames, 2))),
      bytes)
  }

  /** Attach the binary payload column. */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encodePayload(col(textCol)))

  /** Parse one container. Pure bytes→struct — decoder-shaped on purpose. */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= HeaderLen, s"truncated payload for doc $docId")
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, StandardCharsets.US_ASCII) == Magic,
      s"bad magic for doc $docId")
    MediaMeta(
      doc_id = docId,
      byte_len = (payload.length - HeaderLen).toLong,
      width = bb.getInt(),
      height = bb.getInt(),
      n_frames = bb.getShort().toInt)
  }

  /** Partition-parallel decode: one decoder context per partition, rows
    * streamed through it — the mapInPandas/mapPartitions shape. Column
    * pruning keeps the payload out of every query that doesn't decode. */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(df)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize the codec once here, reuse per row
        rows.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Relational little-endian integer parse out of the binary payload
    * (1-based byte offset): hex the slice, reverse the byte pairs, conv
    * to decimal — all codegen'd string/binary ops, no UDF. */
  private def leField(payload: Column, off: Int, n: Int): Column =
    conv(
      concat((n - 1 to 0 by -1).map { i =>
        substring(hex(substring(payload, off, n)), 2 * i + 1, 2)
      }: _*),
      16, 10).cast("int")

  /** Frame sampling — every `stride`-th frame of each container, sliced
    * straight out of the binary column (video keyframe extraction
    * shape). The media bytes split into `n_frames` fixed-size frames
    * (floor division; the tail remainder rides the LAST frame). Fully
    * relational: header fields parse via [[leField]], sampled indexes
    * `explode(sequence(...))`, slices are binary `substring` — the plan
    * stays in whole-stage codegen and never moves a payload byte it
    * doesn't emit.
    *
    * Input: a `payload` binary column when present (the served shape —
    * payloads arrive encoded), else one is synthesized from `textCol`.
    * A corrupt magic fails loudly per row: the check GATES the
    * `n_frames` parse (a `when`/`raise_error` branch of the expression
    * every downstream column consumes), so column pruning can never
    * drop it — like a decoder erroring before it reports stream
    * counts. Exercised with a corrupt payload in MultimodalSpec. */
  def frameSample(df: DataFrame, stride: Int = 2, textCol: String = "text"): DataFrame = {
    val withP =
      if (df.columns.contains("payload")) df else withPayload(df, textCol)
    val parsed = withP
      .select(col("doc_id"), col("payload"))
      .withColumn("n_frames",
        when(substring(col("payload"), 1, 4).cast("string") === Magic,
          leField(col("payload"), 13, 2))
          .otherwise(raise_error(
            concat(lit("bad magic for doc "), col("doc_id").cast("string")))
            .cast("int")))
      .withColumn("media_len", (octet_length(col("payload")) - HeaderLen).cast("long"))
      .withColumn("frame_len", floor(col("media_len") / col("n_frames")).cast("long"))
    parsed
      .select(col("doc_id"), col("payload"), col("n_frames"), col("media_len"),
        col("frame_len"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_bytes",
        when(col("frame_idx") === col("n_frames") - 1,
          col("media_len") - col("frame_idx") * col("frame_len"))
          .otherwise(col("frame_len")))
      .withColumn("frame_md5",
        md5(expr(s"substring(payload, cast($HeaderLen + frame_idx * frame_len + 1 as int), " +
          "cast(frame_bytes as int))")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes"), col("frame_md5"))
  }

  final case class Resized(
      doc_id: Long, width: Int, height: Int, n_frames: Int,
      byte_len: Long, payload_md5: String)

  /** Deterministic stand-in for a native resize — STUB for the codec
    * call, real for everything Spark owns: the typed partition-parallel
    * operator decodes each container, "downsamples" by keeping every
    * 2nd media byte (where FFmpeg/libjpeg would interpolate pixels),
    * halves the header dims, and emits the new payload's length + md5.
    * The bytes in → bytes out + typed meta shape, batch layout, and
    * partition-level codec reuse are exactly what a JNI binding needs. */
  def resizeHalf(spark: SparkSession, df: DataFrame): Dataset[Resized] = {
    import spark.implicits._
    withPayload(df)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5") // per partition
        rows.map { case (id, bytes) =>
          val m = decode(id, bytes)
          val media = bytes.drop(HeaderLen)
          val half = Array.tabulate((media.length + 1) / 2)(i => media(2 * i))
          digest.reset()
          Resized(id, m.width / 2, m.height / 2, m.n_frames,
            half.length.toLong,
            digest.digest(half).map("%02x".format(_)).mkString)
        }
      }
  }
}

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
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as a partition-parallel typed operator.
  *
  * The actual media decode is STUBBED (`decodeStub`) — codec libraries
  * are not available in this environment — with a deterministic fake
  * derived from the payload bytes. Everything around it is the real
  * Spark shape: binary column in parquet, case-class schema,
  * `mapPartitions` batching (one decoder init per partition, the same
  * pattern a JNI/FFmpeg binding would need), and column pruning so the
  * binary payload is only read when the decode runs.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic fake "decode": metadata derived from payload length.
    * Replace with a real codec call; the signature (bytes in, typed
    * struct out, no Spark types) is decoder-friendly on purpose. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      byte_len = n,
      width = (640 + n % 128).toInt,
      height = (360 + n % 72).toInt,
      n_frames = (1 + n % 30).toInt)
  }

  /** Attach a binary payload column (here: utf-8 bytes of the text — a
    * stand-in for image/audio blobs that keeps byte counts meaningful). */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Partition-parallel decode: one stub "decoder" per partition, rows
    * streamed through it — the mapInPandas/mapPartitions shape. */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(df)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize the codec once here, reuse per row
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}

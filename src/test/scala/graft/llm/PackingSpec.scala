package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  // one shard (doc_id % 1) keeps the hand-computed stream simple
  private val docs = Seq(
    (0L, "a b c"),           // 3 tokens: stream [0, 3)
    (1L, "d e f g h"),       // 5 tokens: [3, 8)
    (2L, "i j k l m n o p"), // 8 tokens: [8, 16) — spans the 10-boundary
    (3L, "q")                // 1 token: [16, 17)
  ).toDF("doc_id", "text")

  test("packConcat: bins, spans and offsets over one shard") {
    val got = Packing.packConcat(docs, seqLen = 10, shards = 1)
      .select("doc_id", "n_tokens", "bin_first", "bin_last", "start_in_bin", "n_bins")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 3L, 0L, 0L, 0L, 1L),
      (1L, 5L, 0L, 0L, 3L, 1L),
      (2L, 8L, 0L, 1L, 8L, 2L), // straddles the seqLen boundary
      (3L, 1L, 1L, 1L, 6L, 1L)))
  }

  test("packConcat: a doc longer than seqLen spans several bins") {
    val long = Seq((7L, (1 to 25).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val row = Packing.packConcat(long, seqLen = 10, shards = 4)
      .select("shard", "bin_first", "bin_last", "n_bins")
      .as[(Long, Long, Long, Long)].head()
    assert(row == (3L, 0L, 2L, 3L)) // 25 tokens = bins 0..2 of shard 7%4
  }

  test("packConcat: shards are independent streams") {
    val got = Packing.packConcat(docs, seqLen = 10, shards = 2)
      .select("doc_id", "shard", "start_in_bin")
      .as[(Long, Long, Long)].collect().toSet
    // shard 0: docs 0 (3 tok) then 2 (8 tok); shard 1: docs 1 then 3
    assert(got == Set((0L, 0L, 0L), (2L, 0L, 3L), (1L, 1L, 0L), (3L, 1L, 5L)))
  }

  test("chunkWindows: stride walk, right-clamped tail, no contained chunk") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    // n=10, window=8, stride=4 -> ceil(2/4)+1 = 2 chunks: [0,8) and [4,10)
    val got = Packing.chunkWindows(df, window = 8, stride = 4)
      .select("chunk_idx", "start_tok", "end_tok", "chunk_tokens")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 0L, 8L, 8L), (1, 4L, 10L, 6L)))
  }

  test("chunkWindows: short doc yields exactly one short chunk") {
    val df = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val got = Packing.chunkWindows(df, window = 8, stride = 4)
      .select("chunk_idx", "start_tok", "end_tok").as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 0L, 3L)))
  }

  test("chunkWindows: content digest matches a hand-joined slice") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Packing.chunkWindows(df, window = 3, stride = 2)
      .select("chunk_idx", "chunk_md5").as[(Int, String)].collect().toMap
    val md5of = (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // chunks: [a b c], [c d e]  (n=5, w=3, s=2 -> ceil(2/2)+1 = 2 chunks)
    assert(got == Map(0 -> md5of("a b c"), 1 -> md5of("c d e")))
  }
}

package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The reference's exhaustive overlap-shape table, `TestVerticalCompaction`
  * (`db_test.go:1793`): every case is checked twice — as a vertical QUERY
  * merge (readRange over the overlapping blocks) and as a vertical
  * COMPACTION (merge each overlap group, re-read, same answer) — against
  * the reference's literal expected sample lists.
  *
  * The table pins the dedup recency semantics: blocks are queried in
  * MIN-TIME order (`db.go:386-388`), so on a duplicate timestamp the
  * overlapping block with the greatest `mint` wins — case 4's third
  * block (written LAST, mint 3) loses to the second (mint 7) inside
  * [7,11], which creation-order recency would get backwards. */
class VerticalCompactionSpec extends SparkSuite {

  private type Series = (String, Seq[(Int, Int)])

  private def s(key: String)(vs: (Int, Int)*): Series = (key, vs.toSeq)

  private case class VC(
      name: String,
      blocks: Seq[Seq[Series]],
      exp: Map[String, Seq[(Int, Int)]],
      expBlocks: Int,
      expGroups: Int)

  private val AB = """{a="b"}"""

  private val cases = Seq(
    VC("case 0: simple overlap",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 7 -> 0, 8 -> 0, 9 -> 0)),
        Seq(s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99,
          10 -> 99, 11 -> 99, 12 -> 99, 13 -> 99, 14 -> 99))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
        6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99, 11 -> 99, 12 -> 99,
        13 -> 99, 14 -> 99)),
      expBlocks = 1, expGroups = 1),

    VC("case 1: contained overlap",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 7 -> 0, 8 -> 0,
          9 -> 0, 11 -> 0, 13 -> 0, 17 -> 0)),
        Seq(s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
        6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99, 11 -> 0, 13 -> 0, 17 -> 0)),
      expBlocks = 1, expGroups = 1),

    VC("case 2: contained + chained-right overlap",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 7 -> 0, 8 -> 0,
          9 -> 0, 11 -> 0, 13 -> 0, 17 -> 0)),
        Seq(s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99)),
        Seq(s(AB)(14 -> 59, 15 -> 59, 17 -> 59, 20 -> 59, 21 -> 59, 22 -> 59))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
        6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 11 -> 0, 13 -> 0, 14 -> 59,
        15 -> 59, 17 -> 59, 20 -> 59, 21 -> 59, 22 -> 59)),
      expBlocks = 1, expGroups = 1),

    VC("case 3: bridge block overlapping both sides",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0, 9 -> 0)),
        Seq(s(AB)(14 -> 59, 15 -> 59, 17 -> 59, 20 -> 59, 21 -> 59, 22 -> 59)),
        Seq(s(AB)(5 -> 99, 6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99,
          13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 99, 6 -> 99,
        7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99, 13 -> 99, 14 -> 59, 15 -> 59,
        16 -> 99, 17 -> 59, 20 -> 59, 21 -> 59, 22 -> 59)),
      expBlocks = 1, expGroups = 1),

    VC("case 4: min-time recency beats creation order",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0, 9 -> 0,
          10 -> 0, 13 -> 0, 15 -> 0, 16 -> 0, 17 -> 0, 20 -> 0, 22 -> 0)),
        Seq(s(AB)(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59)),
        Seq(s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 8 -> 99, 9 -> 99, 10 -> 99,
          13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
        6 -> 99, 7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59, 13 -> 99,
        15 -> 99, 16 -> 99, 17 -> 99, 20 -> 0, 22 -> 0)),
      expBlocks = 1, expGroups = 1),

    VC("case 5: multiple series merge independently",
      blocks = Seq(
        Seq(
          s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0, 9 -> 0,
            10 -> 0, 13 -> 0, 15 -> 0, 16 -> 0, 17 -> 0, 20 -> 0, 22 -> 0),
          s("""{b="c"}""")(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0,
            9 -> 0, 10 -> 0, 13 -> 0, 15 -> 0, 16 -> 0, 17 -> 0, 20 -> 0, 22 -> 0),
          s("""{c="d"}""")(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0,
            9 -> 0, 10 -> 0, 13 -> 0, 15 -> 0, 16 -> 0, 17 -> 0, 20 -> 0, 22 -> 0)),
        Seq(
          s("""{__name__="a"}""")(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59),
          s(AB)(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59),
          s("""{aa="bb"}""")(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59),
          s("""{c="d"}""")(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59)),
        Seq(
          s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 8 -> 99, 9 -> 99, 10 -> 99,
            13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99),
          s("""{aa="bb"}""")(3 -> 99, 5 -> 99, 6 -> 99, 8 -> 99, 9 -> 99,
            10 -> 99, 13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99),
          s("""{c="d"}""")(3 -> 99, 5 -> 99, 6 -> 99, 8 -> 99, 9 -> 99,
            10 -> 99, 13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99))),
      exp = Map(
        """{__name__="a"}""" -> Seq(7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59),
        AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99, 6 -> 99,
          7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59, 13 -> 99, 15 -> 99,
          16 -> 99, 17 -> 99, 20 -> 0, 22 -> 0),
        """{aa="bb"}""" -> Seq(3 -> 99, 5 -> 99, 6 -> 99, 7 -> 59, 8 -> 59,
          9 -> 59, 10 -> 59, 11 -> 59, 13 -> 99, 15 -> 99, 16 -> 99, 17 -> 99),
        """{b="c"}""" -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 8 -> 0,
          9 -> 0, 10 -> 0, 13 -> 0, 15 -> 0, 16 -> 0, 17 -> 0, 20 -> 0, 22 -> 0),
        """{c="d"}""" -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
          6 -> 99, 7 -> 59, 8 -> 59, 9 -> 59, 10 -> 59, 11 -> 59, 13 -> 99,
          15 -> 99, 16 -> 99, 17 -> 99, 20 -> 0, 22 -> 0)),
      expBlocks = 1, expGroups = 1),

    VC("case 6: two disjoint overlap groups compact separately",
      blocks = Seq(
        Seq(s(AB)(0 -> 0, 1 -> 0, 2 -> 0, 4 -> 0, 5 -> 0, 7 -> 0, 8 -> 0, 9 -> 0)),
        Seq(s(AB)(3 -> 99, 5 -> 99, 6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99,
          10 -> 99, 11 -> 99, 12 -> 99, 13 -> 99, 14 -> 99)),
        Seq(s(AB)(20 -> 0, 21 -> 0, 22 -> 0, 24 -> 0, 25 -> 0, 27 -> 0,
          28 -> 0, 29 -> 0)),
        Seq(s(AB)(23 -> 99, 25 -> 99, 26 -> 99, 27 -> 99, 28 -> 99, 29 -> 99,
          30 -> 99, 31 -> 99))),
      exp = Map(AB -> Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 99, 4 -> 0, 5 -> 99,
        6 -> 99, 7 -> 99, 8 -> 99, 9 -> 99, 10 -> 99, 11 -> 99, 12 -> 99,
        13 -> 99, 14 -> 99, 20 -> 0, 21 -> 0, 22 -> 0, 23 -> 99, 24 -> 0,
        25 -> 99, 26 -> 99, 27 -> 99, 28 -> 99, 29 -> 99, 30 -> 99, 31 -> 99)),
      expBlocks = 2, expGroups = 2))

  private def readSeries(store: BlockStore): Map[String, Seq[(Int, Int)]] =
    store.readRange(spark, 0L, 100L)
      .select("series_key", "t", "v")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getLong(1).toInt, r.getDouble(2).toInt))
          .sortBy(_._1).toSeq
      }

  cases.foreach { c =>
    test(s"TestVerticalCompaction ${c.name} (db_test.go:1793)") {
      import spark.implicits._
      val store = new BlockStore(
        Files.createTempDirectory("graft-vc").toString, blockRangeMs = 1000L)
      c.blocks.foreach { series =>
        val rows = series.flatMap { case (key, samples) =>
          samples.map { case (t, v) => (key, t.toLong, v.toDouble) }
        }
        store.write(
          rows.zipWithIndex
            .map { case ((k, t, v), i) => (i.toLong, k, t, v) }
            .toDF("sample_id", "series_key", "t", "v"))
      }
      assert(store.manifest.blocks.size == c.blocks.size)
      // vertical QUERY merging, pre-compaction
      assert(readSeries(store) == c.exp)
      // vertical compaction: one merge per overlap group
      val groups = Compaction.overlappingGroups(store.manifest.blocks)
      assert(groups.size == c.expGroups)
      groups.foreach(g => store.compact(spark, g.map(_.blockId)))
      assert(store.manifest.blocks.size == c.expBlocks)
      // same answer from the compacted store
      assert(readSeries(store) == c.exp)
    }
  }
}

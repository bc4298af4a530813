package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.query.TsdbSource

class TombstonesSpec extends SparkSuite {
  import spark.implicits._

  def iv(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("series_key", "mint", "maxt")

  def coalesced(rows: (String, Long, Long)*): Set[(String, Long, Long)] =
    Tombstones.coalesceIntervals(iv(rows: _*))
      .as[(String, Long, Long)].collect().toSet

  test("interval coalescing matches reference semantics (tombstones_test.go:60-128)") {
    // overlapping
    assert(coalesced(("s", 1, 4), ("s", 5, 6)) == Set(("s", 1L, 6L))) // adjacent merges
    assert(coalesced(("s", 1, 10), ("s", 12, 20), ("s", 25, 30), ("s", 21, 23)) ==
      Set(("s", 1L, 10L), ("s", 12L, 23L), ("s", 25L, 30L)))
    assert(coalesced(("s", 1, 10), ("s", 12, 20), ("s", 25, 30), ("s", 9, 230)) ==
      Set(("s", 1L, 230L)))
    assert(coalesced(("s", 5, 10), ("s", 12, 20), ("s", 25, 30), ("s", 1, 4)) ==
      Set(("s", 1L, 10L), ("s", 12L, 20L), ("s", 25L, 30L)))
    assert(coalesced(("s", 5, 10), ("s", 12, 20), ("s", 25, 30), ("s", 11, 14)) ==
      Set(("s", 5L, 20L), ("s", 25L, 30L)))
    // distinct series never merge
    assert(coalesced(("a", 1, 5), ("b", 4, 9)) == Set(("a", 1L, 5L), ("b", 4L, 9L)))
  }

  test("applyTo drops samples inside deleted intervals, closed bounds (querier.go:1166-1204)") {
    val samples = (0L to 9L).map(t => (t, "{a=\"b\"}", t, t.toDouble))
      .toDF("sample_id", "series_key", "t", "v")
    val tombs = iv(("{a=\"b\"}", 1, 3), ("{a=\"b\"}", 6, 6))
    val left = Tombstones.applyTo(samples, tombs)
      .select("t").as[Long].collect().sorted
    assert(left.toSeq == Seq(0L, 4L, 5L, 7L, 8L, 9L))
  }

  test("forMatchers records one interval per matching series") {
    val samples = TsdbSource.events(spark, sf).samples
    val tombs = Tombstones.forMatchers(samples, 100L, 200L, graft.matchers.Eq("name", "click"))
    assert(tombs.columns.toSeq == Seq("series_key", "mint", "maxt"))
    assert(tombs.count() == samples.where($"series_key".contains("name=\"click\""))
      .select("series_key").distinct().count())
  }
}

class MergeSpec extends SparkSuite {
  import spark.implicits._

  test("vertical dedup: later block wins on duplicate t (querier.go:1039-1042)") {
    val a = Seq((1L, "s1", 10L, 1.0, 1), (2L, "s1", 20L, 2.0, 1), (3L, "s2", 10L, 3.0, 1))
      .toDF("sample_id", "series_key", "t", "v", "block_seq")
    val b = Seq((4L, "s1", 20L, 99.0, 2), (5L, "s1", 30L, 5.0, 2))
      .toDF("sample_id", "series_key", "t", "v", "block_seq")
    val got = Merge.dedupLatest(a.unionByName(b))
      .select("series_key", "t", "v").as[(String, Long, Double)]
      .collect().toSet
    assert(got == Set(("s1", 10L, 1.0), ("s1", 20L, 99.0), ("s1", 30L, 5.0), ("s2", 10L, 3.0)))
  }
}

class BlockStoreSpec extends SparkSuite {

  lazy val root: String = Files.createTempDirectory("graft-blocks").toString
  lazy val store = new BlockStore(root, 7 * 86400000L) // 7d blocks
  lazy val samples: DataFrame = TsdbSource.events(spark, sf).samples

  test("write/read roundtrip preserves samples and partitions by block") {
    store.write(samples, SaveMode.Overwrite)
    val back = store.read(spark)
    assert(back.count() == samples.count())
    assert(back.columns.contains("t_bucket"))
    // block dirs on disk
    val dirs = new java.io.File(s"$root/data").listFiles().filter(_.isDirectory)
    assert(dirs.forall(_.getName.startsWith("t_bucket=")) && dirs.length >= 4)
  }

  test("readRange prunes to overlapping blocks and clamps samples") {
    store.write(samples, SaveMode.Overwrite)
    val mint = 1704067200000L + 8 * 86400000L
    val maxt = mint + 3 * 86400000L
    val got = store.readRange(spark, mint, maxt)
    val want = samples.where(col("t").between(mint, maxt))
    assert(got.count() == want.count() && got.count() > 0)
    // partition filter present in the plan (directory pruning, not row filter)
    val plan = store.readRange(spark, mint, maxt).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    assert(!plan.replaceAll("(?s).*PartitionFilters: \\[", "").startsWith("]"), plan.take(1500))
  }

  test("meta table reports per-block span and stats (block.go:152-177)") {
    store.write(samples, SaveMode.Overwrite)
    val meta = store.meta(spark).collect()
    assert(meta.map(_.getAs[Long]("num_samples")).sum == samples.count())
    meta.foreach { r =>
      val bucket = r.getAs[Long]("t_bucket")
      assert(r.getAs[Long]("mint") >= bucket - store.blockRangeMs)
      assert(r.getAs[Long]("maxt") < bucket)
    }
  }

  test("compacted rewrites into wider deduped blocks") {
    store.write(samples, SaveMode.Overwrite)
    val wide = store.compacted(spark, factor = 2)
    assert(wide.count() == samples.count()) // no overlaps in input => no drops
    assert(wide.select("t_bucket").distinct().count() <=
      store.meta(spark).count() / 2 + 1)
  }

  test("afterRetention drops blocks older than keep window (db.go:865-906)") {
    store.write(samples, SaveMode.Overwrite)
    val kept = store.afterRetention(spark, 14 * 86400000L)
    val maxT = samples.agg(max("t")).head().getLong(0)
    assert(kept.agg(min("t_bucket")).head().getLong(0) > maxT - 14 * 86400000L)
    assert(kept.count() < samples.count() && kept.count() > 0)
  }

  test("exponential compaction ranges (compact.go:41-50)") {
    assert(BlockStore.exponentialRanges(7200000L, 3) == Seq(7200000L, 21600000L, 64800000L))
  }
}

class AppenderSpec extends SparkSuite {
  import spark.implicits._
  import graft.ingest.Appender

  def batch(rows: (String, Long, Double, Long)*): DataFrame =
    rows.toDF("series_key", "t", "v", "arrival")

  def statuses(df: DataFrame): Seq[String] =
    df.orderBy("arrival").select("status").as[String].collect().toSeq

  test("in-order appends are ok; regressions are out_of_order (head.go:1680-1699)") {
    val got = statuses(Appender.validate(
      batch(("s", 10, 1.0, 1), ("s", 20, 2.0, 2), ("s", 15, 3.0, 3), ("s", 30, 4.0, 4)),
      minValidTime = 0))
    assert(got == Seq("ok", "ok", "out_of_order", "ok"))
  }

  test("amend: same t same v ok; same t different v rejected (db_test.go:348-398)") {
    val got = statuses(Appender.validate(
      batch(("s", 10, 1.0, 1), ("s", 10, 1.0, 2), ("s", 10, 2.0, 3)),
      minValidTime = 0))
    assert(got == Seq("ok", "ok", "amend"))
  }

  test("NaN re-append is idempotent (db_test.go:366)") {
    val nan = Double.NaN
    val got = statuses(Appender.validate(
      batch(("s", 10, nan, 1), ("s", 10, nan, 2)), minValidTime = 0))
    assert(got == Seq("ok", "ok"))
  }

  test("out_of_bounds below minValidTime (head.go:827-830)") {
    val got = statuses(Appender.validate(
      batch(("s", 5, 1.0, 1), ("s", 50, 2.0, 2)), minValidTime = 10))
    assert(got == Seq("out_of_bounds", "ok"))
  }

  test("baseline high-water mark from prior batches is honored") {
    val baseline = Seq(("s", 100L, 9.0)).toDF("series_key", "max_t", "last_v")
    val got = statuses(Appender.validate(
      batch(("s", 50, 1.0, 1), ("s", 100, 9.0, 2), ("s", 100, 8.0, 3), ("s", 150, 2.0, 4)),
      minValidTime = 0, baseline = Some(baseline)))
    assert(got == Seq("out_of_order", "ok", "amend", "ok"))
  }

  test("series are independent") {
    val got = Appender.validate(
      batch(("a", 10, 1.0, 1), ("b", 5, 1.0, 2), ("a", 5, 1.0, 3)),
      minValidTime = 0)
    assert(got.where($"series_key" === "b").select("status").as[String].head() == "ok")
  }
}

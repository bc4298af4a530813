package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.matchers.{Eq, Matcher, Re}

class QuerierSpec extends SparkSuite {

  lazy val src = TsdbSource.events(spark, sf)

  test("samples long format has the canonical schema") {
    val df = src.samples
    assert(df.columns.toSeq == Seq("sample_id", "series_key", "labels", "t", "v"))
    assert(df.count() == 1000)
  }

  test("series_key is canonical: sorted keys, vip sparse") {
    val row = src.samples.where(col("labels").getItem("vip").isNotNull).head()
    val key = row.getAs[String]("series_key")
    assert(key.matches("""\{name="[a-z]+",user="\d+",vip="1"\}"""), key)
  }

  test("static series_key equals the generic map-derived form on every row") {
    // samples builds the key statically from the plan-time label columns;
    // it must match graft.functions.seriesKey over the labels map exactly
    val mismatches = src.samples
      .where(graft.functions.seriesKey(col("labels")) =!= col("series_key"))
      .count()
    assert(mismatches == 0)
  }

  test("select: eq matcher + time range equals manual filter") {
    val got = src.select(1704067200000L, 1706745600000L, Eq("name", "click")).count()
    val want = src.samples.where(col("labels")("name") === "click").count()
    assert(got == want && got > 0)
  }

  test("select: neq over sparse label selects absent-label series") {
    val got = src.select(0L, Long.MaxValue / 2, Matcher.neq("vip", "1"))
    assert(got.count() > 0)
    assert(got.where(col("series_key").contains("vip")).count() == 0)
  }

  test("select: regex full-anchoring") {
    // 'lick' is a substring of 'click' — unanchored would match
    assert(src.select(0L, Long.MaxValue / 2, Re("name", "lick")).count() == 0)
    assert(src.select(0L, Long.MaxValue / 2, Re("name", "cl.*")).count() > 0)
  }

  test("labelNames / labelValues") {
    val q = new Querier(src.samples)
    assert(q.labelNames().collect().map(_.getString(0)).toSeq == Seq("name", "user", "vip"))
    val vals = q.labelValues("name").collect().map(_.getString(0)).toSeq
    assert(vals == Seq("click", "error", "purchase", "signup", "view"))
  }

  test("label matchers reach the parquet scan as pushed filters") {
    val plan = src.select(1704067200000L, 1706745600000L, Eq("name", "click"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,click)"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan.take(2000))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution profiler for the PromQL-vs-hand-built rate gap (the
  * BENCH_NOTES "where does the 8× go" question): runs the window
  * family's plan SHAPES as black-box differentials over the same
  * synthetic scrape corpus `Bench.rateSection` uses, so each pair of
  * rows isolates one cost component:
  *
  *   - `scan`            — parquet read + noop sink (the floor)
  *   - `lag`             — scan + the ONE series-window lag pre-pass
  *                         (counter semantics; shared by both paths)
  *   - `increase_1h`     — hand-built bucket-grain increase (the
  *                         BASELINE.md Msamples/s row)
  *   - `xrate_1h`        — hand-built extrapolated rate (adds the
  *                         first/last boundary picks — PromQL's math at
  *                         bucket grain)
  *   - `promql_tumbling` — `rate(m[1h])` at step=1h: the language path
  *                         when the OUTPUT grain matches the relational
  *                         consumers' (k=1 ⇒ the candidate explode
  *                         degenerates to one hash aggregate — same
  *                         shape as xrate_1h plus extrapolation)
  *   - `promql_1anchor`  — `rate(m[2h])` at step=1m, single eval
  *                         instant: the window decomposition's fixed
  *                         machinery (stage-1 bucket partials + splice)
  *                         WITHOUT anchor-lattice density
  *   - `promql_count`    — `count_over_time(m[2h])` at 1m over the full
  *                         hour: the decomposition at full anchor
  *                         density but with NO lag pre-pass and one
  *                         stat channel
  *   - `promql_rate`     — `rate(m[2h])` at 1m over the full hour: the
  *                         committed bench row (anchor-grain output,
  *                         61 anchors/series)
  *
  * Run: `sbt "runMain graft.RateProfile [series] [perSeries]"`
  * (defaults 50k × 400 = the rate_20m corpus).
  */
object RateProfile {
  private def runPlan(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timedSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best2(f: => Unit): Double =
    math.min(timedSec(f), timedSec(f))

  def main(args: Array[String]): Unit = {
    val series = if (args.length > 0) args(0).toLong else 50000L
    val perSeries = if (args.length > 1) args(1).toLong else 400L
    val n = series * perSeries
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        math.max(32L, n / 2000000L).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)

    // `big` mode (the 2B-row decade rehearsal): one timed pass per row,
    // no generation-time repartition (a 2B-row shuffle spent purely on
    // file layout; range's natural partitioning is a time-sliced scrape
    // layout), GC between queries so the previous query's shuffle files
    // free before the next one needs the disk.
    val big = args.length > 2 && args(2) == "big"
    val tmp = java.nio.file.Files.createTempDirectory("graft-rprof-").toString
    try {
      // corpus: Bench.rateSection's verbatim generator (30s scrape grid
      // + sub-second jitter, 100-valued sawtooth)
      val t0 = 1704067200000L
      val idx = expr(s"id div $series")
      val gen = spark.range(n).select(
          concat(lit("s"), (col("id") % series).cast("string")).as("series_key"),
          col("id").as("sample_id"),
          (lit(t0) + idx * 30000L + pmod(col("id") * 2654435761L, lit(997L)))
            .as("t"),
          (pmod(col("id") * 48271L, lit(100000L)).cast("double") / 100.0).as("v"))
      (if (big) gen else gen.repartition(32))
        .write.mode("overwrite").parquet(s"$tmp/samples")
      val samples = spark.read.parquet(s"$tmp/samples")
      val labelled = samples.withColumn("labels",
        map(lit("__name__"), lit("m")))

      def promqlDf(q: String, startMs: Long, endMs: Long, stepMs: Long) =
        graft.query.PromQl.evalUnsorted(q, labelled,
          graft.query.PromQl.Params(startMs, endMs, stepMs,
            seriesEstimate = Some(series)))
      def promql(q: String, startMs: Long, endMs: Long, stepMs: Long): Unit =
        runPlan(promqlDf(q, startMs, endMs, stepMs))

      // plan-audit mode: `runMain graft.RateProfile <series> <per> explain`
      if (args.length > 2 && args(2) == "explain") {
        println("========== promql_tumbling rate(m[1h]) step=1h ==========")
        promqlDf("rate(m[1h])", t0 + 3600000L, t0 + 3 * 3600000L, 3600000L)
          .explain("formatted")
        println("========== xrate_1h (hand-built) ==========")
        graft.query.Rate.extrapolatedRate(
          graft.query.Rate.seriesOrdered(samples), 3600000L)
          .explain("formatted")
        return
      }

      // the lag pre-pass, stated inline (the compiler's lagFeats twin)
      def lagPass(): Unit = {
        val w = Window.partitionBy("series_key").orderBy("t", "v")
        runPlan(samples
          .withColumn("prev_v", lag("v", 1).over(w))
          .withColumn("inc_delta",
            when(col("prev_v").isNull, lit(null).cast("double"))
              .when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
              .otherwise(col("v"))))
      }

      def gcPause(): Unit = { System.gc(); Thread.sleep(3000) }
      val rows: Seq[(String, Double)] =
        if (big) {
          // the decade rows only, one pass each, shuffle files GC'd
          // between queries (a 2B-row exchange leaves ~10s of GB on
          // disk until the ShuffleDependency is reaped)
          val scanS = timedSec(runPlan(samples)); gcPause()
          val incS = timedSec(
            runPlan(graft.query.Rate.increase(
              graft.query.Rate.seriesOrdered(samples), 3600000L)))
          gcPause()
          val tumS = timedSec(
            promql("rate(m[1h])", t0 + 3600000L, t0 + 3 * 3600000L, 3600000L))
          Seq("scan" -> scanS, "increase_1h" -> incS,
            "promql_tumbling" -> tumS,
            "msamples_per_sec" -> n / incS / 1e6)
        } else Seq(
        "scan" -> best2(runPlan(samples)),
        "lag" -> best2(lagPass()),
        "increase_1h" -> best2(
          runPlan(graft.query.Rate.increase(
            graft.query.Rate.seriesOrdered(samples), 3600000L))),
        "xrate_1h" -> best2(
          runPlan(graft.query.Rate.extrapolatedRate(
            graft.query.Rate.seriesOrdered(samples), 3600000L))),
        "promql_tumbling" -> best2(
          promql("rate(m[1h])", t0 + 3600000L, t0 + 3 * 3600000L, 3600000L)),
        "promql_1anchor" -> best2(
          promql("rate(m[2h])", t0 + 2 * 3600000L, t0 + 2 * 3600000L, 60000L)),
        "promql_count" -> best2(
          promql("count_over_time(m[2h])",
            t0 + 2 * 3600000L, t0 + 3 * 3600000L, 60000L)),
        "promql_rate" -> best2(
          promql("rate(m[2h])", t0 + 2 * 3600000L, t0 + 3 * 3600000L, 60000L)))
      println(rows.map { case (k, v) =>
        f""""$k":$v%.2f""" }.mkString(s"""{"profile":"rate","n":$n,""", ",", "}"))
    } finally {
      scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}

package graft.query

import graft.SparkSuite

class RateSpec extends SparkSuite {
  import spark.implicits._

  test("increase sums deltas, treats drops as counter resets") {
    // series a: 0 -> 10 -> 4 (reset: +4) -> 9 (+5); series b monotone
    val samples = Seq(
      (1L, "a", 0L, 0.0), (2L, "a", 100L, 10.0),
      (3L, "a", 200L, 4.0), (4L, "a", 300L, 9.0),
      (5L, "b", 0L, 5.0), (6L, "b", 100L, 7.5))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.increase(samples, bucketMs = 1000L)
      .select("series_key", "t_bucket", "increase", "n_deltas", "n_resets", "rate_per_sec")
      .as[(String, Long, Double, Long, Long, Double)]
      .collect().toSet
    assert(got == Set(
      ("a", 1000L, 19.0, 3L, 1L, 19.0), // 10 + 4(reset) + 5, over a 1s bucket
      ("b", 1000L, 2.5, 1L, 0L, 2.5)))
  }

  test("lag crosses bucket boundaries: first sample of a bucket measures against the last of the previous") {
    val samples = Seq(
      (1L, "a", 500L, 10.0), (2L, "a", 1500L, 16.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.increase(samples, bucketMs = 1000L)
      .select("t_bucket", "increase", "n_deltas")
      .as[(Long, java.lang.Double, Long)].collect()
      .map { case (b, i, n) => b -> ((i, n)) }.toMap
    // bucket 1000 (t=500): only the lag-less first sample -> null sum
    assert(got(2000L) == (6.0, 1L))
    assert(got(1000L)._2 == 0L)
  }

  test("extrapolatedRate: boundary extrapolation, half-spacing cap, zero-crossing clamp") {
    val samples = Seq(
      // a: edges near the window bounds -> extrapolate the full 100ms
      //    to each edge: factor (800+100+100)/800 = 1.25, 6*1.25 = 7.5
      (1L, "a", 100L, 10.0), (2L, "a", 500L, 12.0), (3L, "a", 900L, 16.0),
      // b: tiny first value -> zero-crossing clamp: durationToStart
      //    becomes si*first_v/delta_v = 300/99, exact result 133.0
      (4L, "b", 600L, 1.0), (5L, "b", 900L, 100.0),
      // c: samples far from both edges -> each side capped at half the
      //    average spacing (50ms): factor (100+50+50)/100 = 2.0
      (6L, "c", 450L, 500.0), (7L, "c", 550L, 505.0),
      // d: single sample, e: zero sampled interval -> both drop
      (8L, "d", 300L, 1.0),
      (9L, "e", 200L, 1.0), (10L, "e", 200L, 2.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.extrapolatedRate(samples, bucketMs = 1000L)
      .select("series_key", "t_bucket", "n", "delta_v", "xincrease", "xrate_per_sec")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(got == Set(
      ("a", 1000L, 3L, 6.0, 7.5, 7.5),
      ("b", 1000L, 2L, 99.0, 133.0, 133.0),
      ("c", 1000L, 2L, 5.0, 10.0, 10.0)))
  }

  test("deriv: least-squares slope per bucket, degenerate buckets null") {
    val samples = Seq(
      // series a: v = 1 + 2*minute -> slope 2/min = 1/30 per sec
      (1L, "a", 0L, 1.0), (2L, "a", 60000L, 3.0), (3L, "a", 120000L, 5.0),
      // series b: single sample -> zero x-variance -> null
      (4L, "b", 0L, 7.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.deriv(samples, bucketMs = 240000L)
      .select("series_key", "n", "deriv_per_sec")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((3L, Some(0.033333))))
    assert(got("b") == ((1L, None)))
  }

  test("overTime aggregates the trailing range frame, timestamp peers included") {
    val samples = Seq(
      (1L, "a", 0L, 1.0), (2L, "a", 1000L, 2.0),
      (3L, "a", 2000L, 3.0), (4L, "a", 2000L, 5.0), // peers at t=2000
      (5L, "a", 5000L, 4.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.overTime(samples, windowMs = 1500L)
      .select("sample_id", "n_win", "min_win", "max_win", "sum_win", "avg_win")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 1.0, 1.0, 1.0, 1.0)))
    assert(got(2L) == ((2L, 2L, 1.0, 2.0, 3.0, 1.5)))
    // frame [500, 2000] holds t=1000 and BOTH t=2000 peers — for both rows
    assert(got(3L) == ((3L, 3L, 2.0, 5.0, 10.0, 3.3333)))
    assert(got(4L) == ((4L, 3L, 2.0, 5.0, 10.0, 3.3333)))
    // frame [3500, 5000]: only itself
    assert(got(5L) == ((5L, 1L, 4.0, 4.0, 4.0, 4.0)))
  }

  test("holtWinters tracks a perfect line exactly; single-point buckets drop") {
    val samples = Seq(
      // series a: perfectly linear 10,12,14 -> level tracks the line
      (1L, "a", 0L, 10.0), (2L, "a", 100L, 12.0), (3L, "a", 200L, 14.0),
      (4L, "b", 0L, 5.0)) // one point: no trend seed -> dropped
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.holtWinters(samples, bucketMs = 1000L, sf = 0.5, tf = 0.5)
      .select("series_key", "n", "smoothed")
      .as[(String, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3, 14.0)))
    assert(!got.contains("b"))
  }

  test("holtWinters with asymmetric parameters on a trend break: sf/tf not interchangeable") {
    // 10, 12, 11 with sf=0.3, tf=0.1: s0=10, b0=2; s1=12, b1=2;
    // s2 = .3*11 + .7*14 = 13.1 — swapping sf/tf would give 13.7
    val samples = Seq(
      (1L, "a", 0L, 10.0), (2L, "a", 100L, 12.0), (3L, "a", 200L, 11.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.holtWinters(samples, bucketMs = 1000L, sf = 0.3, tf = 0.1)
      .select("smoothed").as[Double].collect()
    assert(got.toSeq == Seq(13.1))
  }

  test("predictLinear extrapolates the bucket's fit; degenerate buckets null") {
    val samples = Seq(
      // series a: v = 1 + 2*minute exactly -> prediction at minute 5
      // (bucket 240000 ms = 4 min, horizon 60000 ms = 1 min) = 11
      (1L, "a", 0L, 1.0), (2L, "a", 60000L, 3.0), (3L, "a", 120000L, 5.0),
      (4L, "b", 0L, 7.0)) // single sample -> null
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.predictLinear(samples, bucketMs = 240000L, horizonMs = 60000L)
      .select("series_key", "n", "predicted")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((3L, Some(11.0))))
    assert(got("b") == ((1L, None)))
  }

  test("instant keeps only the last step of each bucket; resets divide, zero-width steps null") {
    val samples = Seq(
      // series a, bucket 1000: 3 samples; last step 10 -> 4 is a reset
      (1L, "a", 100L, 2.0), (2L, "a", 500L, 10.0), (3L, "a", 900L, 4.0),
      // series a, bucket 2000: one sample only -> no step, dropped
      (4L, "a", 1500L, 6.0),
      // series b: last two samples share t=800 -> idelta, but null irate
      (5L, "b", 200L, 1.0), (6L, "b", 800L, 3.0), (7L, "b", 800L, 5.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.instant(samples, bucketMs = 1000L)
      .select("series_key", "t_bucket", "dt_ms", "idelta", "irate_per_sec")
      .as[(String, Long, Long, Double, Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("a", 1000L, 400L, -6.0, Some(10.0)), // reset: post-reset v=4 over 0.4s
      ("b", 1000L, 0L, 2.0, None)))
  }

  test("resetsChanges counts within-bucket drops and value changes") {
    val samples = Seq(
      // a: 1 -> 1 (no change) -> 3 (change) -> 2 (change + reset)
      (1L, "a", 0L, 1.0), (2L, "a", 100L, 1.0),
      (3L, "a", 200L, 3.0), (4L, "a", 300L, 2.0),
      // b spans two buckets: the cross-boundary drop must NOT count
      (5L, "b", 900L, 9.0), (6L, "b", 1100L, 1.0))
      .toDF("sample_id", "series_key", "t", "v")
    val got = Rate.resetsChanges(samples, bucketMs = 1000L)
      .select("series_key", "t_bucket", "n_samples", "n_changes", "n_resets")
      .as[(String, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(
      ("a", 1000L, 4L, 2L, 1L),
      ("b", 1000L, 1L, 0L, 0L),
      ("b", 2000L, 1L, 0L, 0L)))
  }

  test("approx_percentile lands inside the exact rank window its error bound promises") {
    // GK returns a REAL sample whose rank is within n/accuracy of the
    // target rank — assert membership in that rank window (±1 rank of
    // slack for rounding-convention differences), not against the
    // interpolated exact percentile, which is not a sample at all
    import org.apache.spark.sql.functions.expr
    val df = TsdbSource.events(spark, sf).samples
    val approx = df.groupBy("series_key")
      .agg(expr("approx_percentile(v, 0.95, 1000)").as("approx"))
      .as[(String, Double)].collect().toMap
    assert(approx.nonEmpty)
    val values = df.select("series_key", "v").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (k, a) =>
      val vs = values(k)
      val target = 0.95 * vs.length
      val eps = vs.length / 1000.0
      val lo = math.max(0, math.floor(target - eps).toInt - 1)
      val hi = math.min(vs.length - 1, math.ceil(target + eps).toInt + 1)
      val window = vs.slice(lo, hi + 1)
      assert(window.contains(a), s"$k: $a not in rank window ${window.mkString(",")}")
    }
  }

  test("rate window consumes the bucketed store scan without an exchange") {
    // same no-shuffle property ts_vertical_dedup asserts: the window's
    // series partitioning is satisfied by the store's bucketed layout
    val dir = java.nio.file.Files.createTempDirectory("graft-rate-").toString
    try {
      val store = new graft.storage.BlockStore(dir, 86400000L, seriesBuckets = 4)
      store.write(
        TsdbSource.events(spark, sf).samples.select("sample_id", "series_key", "t", "v"))
      val plan = Rate.increase(store.read(spark), 86400000L)
        .queryExecution.executedPlan.toString
      val windowIdx = plan.indexOf("Window")
      assert(windowIdx >= 0)
      // printed plans are root-first, so anything BELOW the window
      // appears after it in the string: no shuffle may sit between the
      // bucketed scan and the window (the final agg's exchange, if any,
      // is above the window and prints before it)
      assert(plan.indexOf("Exchange hashpartitioning", windowIdx) < 0, plan.take(3000))
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }

  test("seriesOrdered pre-pass: ONE exchange, ONE sample-scale sort, windows ride both") {
    // the r6 family plan contract: the range pre-pass's exchange+sort
    // satisfy the whole-series window (no further exchange, no further
    // sort below it) — the property behind the -25..-49% x10 deltas
    val plan = Rate.increase(
      Rate.seriesOrdered(TsdbSource.events(spark, sf).samples), 86400000L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly the range exchange:\n${plan.take(3000)}")
    assert(plan.split(" Sort ").length - 1 == 1,
      s"expected exactly the pre-pass sort:\n${plan.take(3000)}")
    // and the window sits above them (root-first print: earlier index),
    // not re-sorting
    assert(plan.indexOf("Window") >= 0 &&
      plan.indexOf("Window") < plan.indexOf("Exchange"), plan.take(3000))
  }

  test("instant (top2 aggregate): one combine-shrunk exchange, no sort, no window") {
    // the r9 irate plan contract: the custom top2 DeclarativeAggregate
    // keeps map-side partial aggregation, so the only exchange carries
    // two structs per (series, bucket) — no window, no sample sort
    val plan = Rate.instant(TsdbSource.events(spark, sf).samples, 86400000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top2"), plan.take(3000))
    assert(plan.split("Exchange").length - 1 == 1, plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains(" Sort "), plan.take(3000))
    assert(plan.contains("partial_top2") || plan.contains("partial top2") ||
      plan.toLowerCase.contains("hashaggregate"), plan.take(3000))
  }

  test("seriesClustered pre-pass: pure aggregate runs with no sort at all") {
    val plan = Rate.seriesClustered(TsdbSource.events(spark, sf).samples)
      .groupBy("series_key").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan.take(2000))
    assert(!plan.contains(" Sort "), plan.take(2000))
  }

  test("preAgg density gate: sparse clusters first, scrape-dense keeps partial combine") {
    import org.apache.spark.sql.functions.{count, lit}
    def planOf(density: Double): String =
      Rate.preAgg(TsdbSource.events(spark, sf).samples, density)
        .groupBy("series_key").agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    // the discriminator is WHAT the one exchange carries: plans print
    // top-down, so "partial above Exchange" = partial runs AFTER the
    // shuffle (raw rows shuffled — the clustered shape), and "Exchange
    // above partial" = map-side combine feeds the shuffle
    val sparse = planOf(2.0)
    assert(sparse.split("Exchange").length - 1 == 1, sparse.take(2000))
    assert(sparse.indexOf("partial_count") < sparse.indexOf("Exchange"),
      sparse.take(2000))
    val dense = planOf(120.0)
    assert(dense.indexOf("Exchange") < dense.indexOf("partial_count"),
      dense.take(2000))
  }
}

package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Model-based battery for the PromQL range-function aggregate: 40
  * random series (irregular gaps, planted resets, seeded) evaluated on
  * a 5m lattice with a 7m range, compared point-for-point against a
  * sequential in-memory model of the Prometheus evaluation rules —
  * half-open `(g − range, g]` windows, consecutive-pair deltas inside
  * the window only, and the full extrapolation closed form for
  * `increase`. The distributed candidate-explode aggregate must land on
  * the sequential semantics for every (series, instant). */
class PromQlPropertySpec extends SparkSuite {
  import spark.implicits._

  private val M = 60000L
  private val RANGE = 7 * M
  private val STEP = 5 * M
  private val START = 10 * M
  private val END = 50 * M

  private lazy val series: Map[String, Vector[(Long, Double)]] = {
    val rnd = new scala.util.Random(42)
    (0 until 40).map { i =>
      val n = 2 + rnd.nextInt(50)
      var t = 500L + rnd.nextInt(5) * 1000L
      val pts = Vector.fill(n) {
        t += 1000L + rnd.nextInt(200000)
        val v =
          if (rnd.nextInt(6) == 0) rnd.nextInt(10).toDouble // planted reset
          else rnd.nextInt(100000) / 100.0
        (t, v)
      }
      s"s$i" -> pts
    }.toMap
  }

  private lazy val frame = series.toSeq
    .flatMap { case (k, pts) =>
      pts.map { case (t, v) =>
        (k, Map("__name__" -> "m", "s" -> k), t, v)
      }
    }
    .toDF("series_key", "labels", "t", "v")

  private def windows: Seq[(String, Long, Vector[(Long, Double)])] =
    for {
      (k, pts) <- series.toSeq
      g <- START to END by STEP
      w = pts.filter { case (t, _) => t > g - RANGE && t <= g }
      if w.nonEmpty
    } yield (k, g, w)

  /** capK forces the plan: MaxValue = candidate explode, 0 = the
    * anchored RANGE-frame window — both must land on the model. */
  private def got(fn: String, capK: Int): Map[(String, Long), Double] =
    PromQl.eval(s"$fn(m[7m])", frame,
      PromQl.Params(START, END, STEP, rangeExplodeCapK = capK))
      .select(col("labels").getItem("s"), col("t"), col("v"))
      .as[(String, Long, Double)].collect()
      .map { case (s, t, v) => (s, t) -> v }.toMap

  private def check(fn: String)(model: Vector[(Long, Double)] => Option[Double]): Unit = {
    val expected = windows.flatMap { case (k, g, w) =>
      model(w).map(v => (k, g) -> v)
    }.toMap
    for (capK <- Seq(Int.MaxValue, 0)) {
      val g = got(fn, capK)
      assert(g.keySet == expected.keySet,
        s"$fn(cap=$capK): ${(g.keySet -- expected.keySet).take(3)} vs ${(expected.keySet -- g.keySet).take(3)}")
      for ((key, want) <- expected) {
        val have = g(key)
        val tol = 1e-9 * math.max(1.0, math.abs(want))
        assert(math.abs(have - want) <= tol, s"$fn(cap=$capK) at $key: $have vs $want")
      }
    }
  }

  private def pairs(w: Vector[(Long, Double)]): Vector[((Long, Double), (Long, Double))] =
    if (w.size < 2) Vector.empty else w.init.zip(w.tail)

  test("sum/count/max/avg_over_time match the sequential model") {
    check("sum_over_time")(w => Some(w.map(_._2).sum))
    check("count_over_time")(w => Some(w.size.toDouble))
    check("max_over_time")(w => Some(w.map(_._2).max))
    check("avg_over_time")(w => Some(w.map(_._2).sum / w.size))
  }

  test("resets and changes count in-window consecutive transitions only") {
    check("resets")(w =>
      Some(pairs(w).count { case ((_, a), (_, b)) => b < a }.toDouble))
    check("changes")(w =>
      Some(pairs(w).count { case ((_, a), (_, b)) => b != a }.toDouble))
  }

  test("instant-vector staleness matches the model in BOTH fill regimes") {
    // the compiler picks latestPerInstant when lookback−1 < step and
    // the candidate-explode gridFillWide otherwise — one model, both
    // regimes: value at g = the max-v sample at the latest t in
    // (g − lookback, g], else absent
    for (lookback <- Seq(3 * M, 5 * M, 11 * M)) { // < step, = step, > step
      val got = PromQl.eval("m", frame,
        PromQl.Params(START, END, STEP, lookbackMs = lookback))
        .select(col("labels").getItem("s"), col("t"), col("v"))
        .as[(String, Long, Double)].collect()
        .map { case (s, t, v) => (s, t) -> v }.toMap
      val expected = (for {
        (k, pts) <- series.toSeq
        g <- START to END by STEP
        w = pts.filter { case (t, _) => t > g - lookback && t <= g }
        if w.nonEmpty
      } yield {
        val latestT = w.map(_._1).max
        (k, g) -> w.filter(_._1 == latestT).map(_._2).max
      }).toMap
      assert(got == expected,
        s"lookback=$lookback: ${(got.toSet -- expected.toSet).take(3)} vs ${(expected.toSet -- got.toSet).take(3)}")
    }
  }

  test("subquery alignment: offset and @ match the sequential model") {
    // the full subquery rule, sequentially: at outer instant g with
    // offset o, the inner window is the half-open (e − r, e] for
    // e = g − o; inner instants are the absolute multiples of the inner
    // step INSIDE that window (left-open: an instant exactly at e − r
    // is out); each instant staleness-fills with the default 5m
    // left-open lookback; the outer function aggregates the filled
    // values. Negative offsets shift e FORWARD. Five (r, s, o) shapes
    // cover both fill regimes (inner step below and at the lookback).
    val look = 5 * M
    def fillAt(pts: Vector[(Long, Double)], tau: Long): Option[Double] = {
      val w = pts.filter { case (t, _) => t > tau - look && t <= tau }
      if (w.isEmpty) None
      else {
        val latest = w.map(_._1).max
        Some(w.filter(_._1 == latest).map(_._2).max)
      }
    }
    def innerInstants(e: Long, r: Long, s: Long): Seq[Long] = {
      val lo = e - r
      val first = if (lo % s == 0) lo + s else (lo / s + 1) * s
      first to e by s
    }
    val cases = Seq(
      (7 * M, 2 * M, 0L), (10 * M, 5 * M, 5 * M), (9 * M, M, 3 * M),
      (12 * M, 5 * M, -5 * M), (8 * M, 3 * M, 0L))
    for ((r, s, o) <- cases) {
      val oStr =
        if (o == 0) ""
        else if (o < 0) s" offset -${-o / M}m"
        else s" offset ${o / M}m"
      val q = s"sum_over_time(m[${r / M}m:${s / M}m]$oStr)"
      val got = PromQl.eval(q, frame, PromQl.Params(START, END, STEP))
        .select(col("labels").getItem("s"), col("t"), col("v"))
        .as[(String, Long, Double)].collect()
        .map { case (k, t, v) => (k, t) -> v }.toMap
      val expected = (for {
        (k, pts) <- series.toSeq
        g <- START to END by STEP
        vs = innerInstants(g - o, r, s).flatMap(tau => fillAt(pts, tau))
        if vs.nonEmpty
      } yield (k, g) -> vs.sum).toMap
      assert(got.keySet == expected.keySet,
        s"$q: ${(got.keySet -- expected.keySet).take(3)} vs ${(expected.keySet -- got.keySet).take(3)}")
      for ((key, want) <- expected) {
        val tol = 1e-9 * math.max(1.0, math.abs(want))
        assert(math.abs(got(key) - want) <= tol, s"$q at $key: ${got(key)} vs $want")
      }
    }
    // @-pinned subqueries (with and without a stacked offset): the
    // trailing window evaluates ONCE at e = T − o and replicates
    for ((r, s, o, atSec, fn) <- Seq(
        (10 * M, 2 * M, 0L, 1800, "max_over_time"),
        (6 * M, 2 * M, 2 * M, 1800, "sum_over_time"))) {
      val oStr = if (o == 0) "" else s" offset ${o / M}m"
      val q = s"$fn(m[${r / M}m:${s / M}m] @ $atSec$oStr)"
      val got = PromQl.eval(q, frame, PromQl.Params(START, END, STEP))
        .select(col("labels").getItem("s"), col("t"), col("v"))
        .as[(String, Long, Double)].collect()
        .map { case (k, t, v) => (k, t) -> v }.toMap
      val expected = (for {
        (k, pts) <- series.toSeq
        vs = innerInstants(atSec * 1000L - o, r, s).flatMap(tau => fillAt(pts, tau))
        if vs.nonEmpty
        agg = if (fn == "max_over_time") vs.max else vs.sum
        g <- START to END by STEP
      } yield (k, g) -> agg).toMap
      assert(got.keySet == expected.keySet, s"$q keys differ")
      for ((key, want) <- expected) {
        val tol = 1e-9 * math.max(1.0, math.abs(want))
        assert(math.abs(got(key) - want) <= tol, s"$q at $key: ${got(key)} vs $want")
      }
    }
  }

  // increase needs the instant g in the model (extrapolation measures
  // distance to the window bounds), so it gets an instant-aware compare
  test("increase extrapolation, instant-aware model") {
    val expected = windows.flatMap { case (k, g, w) =>
      if (w.size < 2) None
      else {
        val incs = pairs(w).map { case ((_, a), (_, b)) =>
          if (b >= a) b - a else b
        }.sum
        val si = (w.last._1 - w.head._1) / 1000.0
        val avg = si / (w.size - 1)
        var ds = (w.head._1 - (g - RANGE)) / 1000.0
        val de = (g - w.last._1) / 1000.0
        if (incs > 0 && w.head._2 >= 0) ds = math.min(ds, si * (w.head._2 / incs))
        val th = avg * 1.1
        val ext = si +
          (if (ds < th) ds else avg / 2) +
          (if (de < th) de else avg / 2)
        Some((k, g) -> incs * (ext / si))
      }
    }.toMap
    for (capK <- Seq(Int.MaxValue, 0)) {
      val g = got("increase", capK)
      assert(g.keySet == expected.keySet)
      for ((key, want) <- expected) {
        val tol = 1e-9 * math.max(1.0, math.abs(want))
        assert(math.abs(g(key) - want) <= tol,
          s"increase(cap=$capK) at $key: ${g(key)} vs $want")
      }
    }
  }
}

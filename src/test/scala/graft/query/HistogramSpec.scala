package graft.query

import graft.SparkSuite

class HistogramSpec extends SparkSuite {
  import spark.implicits._

  // one series, one bucket: 4 samples ≤10, 4 in (10,20], 2 above
  private def samples = Seq(2.0, 4.0, 6.0, 8.0, 12.0, 14.0, 16.0, 18.0, 25.0, 30.0)
    .zipWithIndex
    .map { case (v, i) => (i.toLong, "a", 100L + i, v) }
    .toDF("sample_id", "series_key", "t", "v")

  private def q(phi: Double): Double =
    Histogram.quantile(samples, bucketMs = 1000L, les = Seq(10.0, 20.0), phi = phi)
      .select("q").as[Double].head()

  test("interpolates linearly inside the located bucket") {
    // rank = 5 lands in (10,20] (cum 4 -> 8): 10 + 10 * (5-4)/4
    assert(q(0.5) == 12.5)
  }

  test("first finite bucket interpolates from lower bound 0") {
    // rank = 2 lands in (0,10]: 0 + 10 * 2/4
    assert(q(0.2) == 5.0)
  }

  test("rank in the +Inf bucket returns the highest finite boundary") {
    // rank = 9.5 > cum(20)=8 -> +Inf bucket -> 20
    assert(q(0.95) == 20.0)
  }

  private def frac(lower: Double, upper: Double): Double =
    Histogram.fraction(samples, bucketMs = 1000L, les = Seq(10.0, 20.0),
      lower = lower, upper = upper)
      .select("frac").as[Double].head()

  test("fraction: bounds on exact boundaries use exact cumulative counts") {
    // [0, 10] holds exactly the 4 samples of the first bucket
    assert(frac(0.0, 10.0) == 0.4)
    // [10, 20]: cum(20)=8 minus cum(10)=4
    assert(frac(10.0, 20.0) == 0.4)
  }

  test("fraction: interior bounds interpolate within their bucket") {
    // F(15) = 4 + 4*(15-10)/10 = 6 -> [0,15] = 6/10
    assert(frac(0.0, 15.0) == 0.6)
    // [12.5, 17.5]: (4 + 4*0.75) - (4 + 4*0.25) = 2 -> 0.2
    assert(frac(12.5, 17.5) == 0.2)
  }

  test("fraction: a lower bound below all data contributes zero mass") {
    assert(frac(-5.0, 10.0) == 0.4)
  }

  test("fraction: seeded randomized differential vs a per-bucket counting model") {
    val rnd = new scala.util.Random(42)
    val les = Seq(5.0, 10.0, 20.0, 50.0)
    val bucketMs = 1000L
    val data = (0 until 400).map(i =>
      (i.toLong, s"s${i % 3}", (i % 5) * 1000L + (i % 7) * 10L, rnd.nextDouble() * 60.0))
    val df = data.toDF("sample_id", "series_key", "t", "v")
    def leOfV(v: Double): Double = les.find(v <= _).getOrElse(Double.PositiveInfinity)
    def model(vs: Seq[Double], lo: Double, hi: Double): Double = {
      def cumAt(x: Double): Double = {
        val target = les.find(_ >= x).get
        val prev = les.takeWhile(_ < target).lastOption.getOrElse(0.0)
        val frac = if (x <= prev) 0.0 else (x - prev) / (target - prev)
        val bs = vs.map(leOfV)
        bs.count(_ < target) + bs.count(_ == target) * frac
      }
      BigDecimal((cumAt(hi) - cumAt(lo)) / vs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((lo, hi) <- Seq((7.5, 30.0), (5.0, 50.0), (0.0, 12.0))) {
      val got = Histogram.fraction(df, bucketMs, les, lo, hi)
        .select("series_key", "t_bucket", "frac")
        .as[(String, Long, Double)].collect()
        .map { case (k, b, f) => (k, b) -> f }.toMap
      val want = data
        .groupBy(r => (r._2, (r._3 / bucketMs + 1) * bucketMs))
        .view.mapValues(rs => model(rs.map(_._4), lo, hi)).toMap
      assert(got == want, s"bounds ($lo, $hi)")
    }
  }

  test("groups are independent per (series, t_bucket) and totals are exact") {
    val two = samples.unionByName(
      Seq((100L, "b", 150L, 3.0), (101L, "b", 160L, 50.0))
        .toDF("sample_id", "series_key", "t", "v"))
    val got = Histogram.quantile(two, 1000L, Seq(10.0, 20.0), 0.5)
      .select("series_key", "total", "q")
      .as[(String, Long, Double)].collect()
      .map { case (k, total, qq) => k -> ((total, qq)) }.toMap
    assert(got("a") == (10L, 12.5))
    // series b: rank 1 in (0,10] with n=1 -> 0 + 10 * 1/1 = 10
    assert(got("b") == (2L, 10.0))
  }
}

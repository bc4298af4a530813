package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class NativeHistogramSpec extends SparkSuite {
  import spark.implicits._

  private val ZT = 0.5

  private def df(vs: Seq[Double], key: String = "a"): DataFrame =
    vs.zipWithIndex
      .map { case (v, i) => (i.toLong, key, 100L + i, v) }
      .toDF("sample_id", "series_key", "t", "v")

  private def rows(vs: Seq[Double], schema: Int = 0): DataFrame =
    NativeHistogram.observe(df(vs), 1000L, lit(schema), ZT, col("v"))

  test("bucket index: exact power-of-two boundaries, any schema") {
    val cases = Seq(
      (8.0, 0, 3), (8.000001, 0, 4), (0.5, 0, -1), (1.0, 0, 0),
      (4.000001, 0, 3), (4.0, 0, 2),
      (16.0, -1, 2), (16.000001, -1, 3), (1.0, -1, 0), // base 4
      (2.0, 1, 2), (1.5, 1, 2), (1.4, 1, 1)) // base √2
    val got = cases.map { case (v, s, _) =>
      df(Seq(v)).select(NativeHistogram.bucketIdx(col("v"), lit(s)))
        .as[Int].head()
    }
    assert(got == cases.map(_._3))
  }

  test("bucket index: positive-schema boundary values match direct-pow truth") {
    // At schema > 0 the bucket width w = 2^−schema is fractional, so the
    // one-pow lower-bound rewrite (up0 · 2^−w) is NOT bit-exact — a value
    // exactly ON a boundary double could flip the correction. The fast
    // path is gated to schema ≤ 0; this pins the positive-schema path to
    // the direct-pow ground truth (the quantile/fraction estimators'
    // lowerOf and StreamingHistogram.bucketIdx both use it) on every
    // boundary double and its neighbors.
    for (s <- Seq(1, 2, 3)) {
      // StrictMath, matching Spark's pow expression (Math.pow's
      // intrinsic is 1 ulp off at e.g. 2^−3.5 — a boundary double
      // computed with it sits ABOVE the engine's own boundary)
      val w = StrictMath.pow(2.0, -s)
      def up(i: Int) = StrictMath.pow(2.0, i * w)
      def truth(av: Double): Int = {
        // smallest i with av <= 2^(i·w), by direct comparison
        var i = math.ceil(math.log(av) / math.log(2.0) / w).toInt
        while (up(i) < av) i += 1
        while (up(i - 1) >= av) i -= 1
        i
      }
      val vs = (-8 to 8).map(up).flatMap(b =>
        Seq(b, Math.nextUp(b), Math.nextDown(b)))
      val got = df(vs)
        .select(NativeHistogram.bucketIdx(col("v"), lit(s)))
        .as[Int].collect().toSeq
      assert(got == vs.map(truth),
        s"schema $s: batch bucketIdx diverges from direct-pow boundaries")
    }
  }

  test("observe: NaN observations drop (no phantom bucket rows)") {
    val r = rows(Seq(2.0, Double.NaN, 3.0))
    // no row with a bucket part but a null index (the phantom a NaN
    // used to fabricate: part -1 with idx null from ceil(log2(NaN)))
    assert(r.where(col("part") =!= 0 && col("idx").isNull).count() == 0)
    // the NaN contributes to NOTHING: totals equal the NaN-free twin
    val clean = rows(Seq(2.0, 3.0))
    assert(r.agg(sum("c")).as[Long].head() == clean.agg(sum("c")).as[Long].head())
    assert(NativeHistogram.quantile(r, 0.5, ZT).select("n").as[Long].head() == 2L)
  }

  test("observe: zero bucket, positive and negative parts") {
    // values: -3 (neg idx 2), -0.3 (zero), 0.0 (zero), 3 (pos idx 2), 6 (pos idx 3)
    val r = rows(Seq(-3.0, -0.3, 0.0, 3.0, 6.0))
      .select("part", "idx", "c").collect()
      .map(x => (x.getInt(0), if (x.isNullAt(1)) None else Some(x.getInt(1)), x.getLong(2)))
      .toSet
    assert(r == Set((-1, Some(2), 1L), (0, None, 2L), (1, Some(2), 1L), (1, Some(3), 1L)))
  }

  private def q(vs: Seq[Double], phi: Double): Double =
    NativeHistogram.quantile(rows(vs), phi, ZT)
      .select("q").as[Double].head()

  test("quantile interpolates between exact power-of-two bounds") {
    // 0.0 -> zero bucket; 3 -> (2,4]; 5, 6 -> (4,8]; total 4
    val vs = Seq(0.0, 3.0, 5.0, 6.0)
    // rank 2 lands in (2,4] (cum 1 -> 2): 2 + 2*(2-1)/1 = 4
    assert(q(vs, 0.5) == 4.0)
    // rank 3 lands in (4,8] (cum 2 -> 4): 4 + 4*(3-2)/2 = 6
    assert(q(vs, 0.75) == 6.0)
  }

  test("quantile walks negative buckets in value order") {
    // -5 -> [-8,-4); -3 -> [-4,-2); 1 -> (0.5,1]; total 3, rank 1
    // first bucket in value order is [-8,-4): -8 + 4*(1-0)/1 = -4
    assert(q(Seq(-5.0, -3.0, 1.0), 1.0 / 3.0) == -4.0)
  }

  test("quantile: zero bucket lower bound depends on negative mass") {
    // no negatives: zero bucket is [0, zt]; rank 1 of (0.0, 3.0):
    // 0 + 0.5 * (1-0)/1 = 0.5
    assert(q(Seq(0.0, 3.0), 0.5) == 0.5)
    // with a negative: zero bucket is [-zt, zt]; rank 2 of 3:
    // -0.5 + 1.0*(2-1)/1 = 0.5
    assert(q(Seq(-3.0, 0.0, 3.0), 2.0 / 3.0) == 0.5)
  }

  test("quantile: φ outside [0,1] and φ = 0 edges") {
    assert(q(Seq(1.0, 3.0), 2.0).isPosInfinity)
    assert(q(Seq(1.0, 3.0), -1.0).isNegInfinity)
    // φ = 0: lowest populated bound: 1.0 -> (0.5, 1], lower 0.5
    assert(q(Seq(1.0, 3.0), 0.0) == 0.5)
  }

  test("fraction: linear overlap inside buckets") {
    val r = rows(Seq(0.0, 3.0, 5.0, 6.0)) // zero, (2,4], (4,8] x2
    // [0,4]: zero bucket [0,0.5] fully in, (2,4] fully in, (4,8] out
    assert(NativeHistogram.fraction(r, 0.0, 4.0, ZT)
      .select("frac").as[Double].head() == 0.5)
    // [0,6]: + (4,8] covered (6-4)/4 = 0.5 -> (1+1+2*0.5)/4 = 0.75
    assert(NativeHistogram.fraction(r, 0.0, 6.0, ZT)
      .select("frac").as[Double].head() == 0.75)
  }

  test("stats: geometric-midpoint moments") {
    // 3 -> (2,4] mid √8; 0.0 -> zero bucket mid 0
    val r = rows(Seq(0.0, 3.0))
    val row = NativeHistogram.stats(r, ZT).select("n", "h_sum", "h_avg", "h_stdvar")
      .as[(Long, Double, Double, Double)].head()
    assert(row._1 == 2L && row._2 == 3.0 && row._3 == 1.5)
    val mid = math.sqrt(8.0)
    val expected = (math.pow(0.0 - 1.5, 2) + math.pow(mid - 1.5, 2)) / 2
    assert(math.abs(row._4 - expected) < 5e-5)
  }

  test("sumBy merges mixed schemas at the coarsest resolution") {
    // series a at schema 0: 6 -> idx 3 (4,8]; series b at schema -1:
    // 10 -> idx 2 (4,16]. Merged at schema -1: a's idx 3 -> ceil(3/2)=2.
    val a = NativeHistogram.observe(df(Seq(6.0), "a"), 1000L, lit(0), ZT, col("v"))
    val b = NativeHistogram.observe(df(Seq(10.0), "b"), 1000L, lit(-1), ZT, col("v"))
    val m = NativeHistogram.sumBy(a.unionByName(b), Seq("t_bucket"))
      .select("schema", "part", "idx", "c").as[(Int, Int, Int, Long)].collect()
    assert(m.toSeq == Seq((-1, 1, 2, 2L)))
  }

  test("downscale mapping equals direct bucketing at the coarse schema") {
    // the merge identity the oracle leans on: ceil(idx_s / 2^Δ) over a
    // finer observe ≡ observing directly at the coarser schema
    val vs = Seq(0.7, 1.0, 3.3, 4.0, 9.9, 64.0, 64.1, 300.0, 0.26, 17.0)
    val fine = NativeHistogram.observe(df(vs), 1000L, lit(2), ZT, col("v"))
    val viaMerge = NativeHistogram.sumBy(
      fine.unionByName(
        NativeHistogram.observe(df(Seq(0.7), "zz"), 1000L, lit(-1), ZT, col("v"))),
      Seq("t_bucket"))
      .where(col("part") === 1)
      .select("idx", "c").as[(Int, Long)].collect().toMap
    val direct = NativeHistogram.observe(
      df(vs :+ 0.7, "any"), 1000L, lit(-1), ZT, col("v"))
      .where(col("part") === 1)
      .select("idx", "c").as[(Int, Long)].collect().toMap
    assert(viaMerge == direct)
  }

  test("pack: struct form with sorted sparse bucket arrays") {
    val h = NativeHistogram.pack(rows(Seq(-3.0, 0.0, 3.0, 6.0, 6.5)), ZT,
      Seq("series_key", "t_bucket"))
    val r = h.select(
      col("h.schema"), col("h.z_count"), col("h.count"), col("h.sum"),
      col("h.pos.i"), col("h.pos.c"), col("h.neg.i"))
      .as[(Int, Long, Long, Double, Seq[Int], Seq[Long], Seq[Int])].head()
    assert(r == ((0, 1L, 5L, 12.5, Seq(2, 3), Seq(1L, 2L), Seq(2))))
  }
}

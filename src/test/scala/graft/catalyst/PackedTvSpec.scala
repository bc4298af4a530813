package graft.catalyst

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** The order-preserving (t, v) → DECIMAL(38,0) packing behind the
  * fills' HashAggregate max ([[PackedTvKernel]]). */
class PackedTvSpec extends SparkSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private val doubles: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e18, 1e18),
    Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue))
  private val times: Gen[Long] = Gen.oneOf(
    Gen.choose(-1000000L, 4000000000000L), Gen.const(0L),
    Gen.const(1704067200000L))

  test("pack/unpack roundtrip is exact (bits, including NaN/-0.0)") {
    check(Prop.forAll(times, doubles) { (t: Long, v: Double) =>
      val d = PackedTvKernel.pack(t, v)
      PackedTvKernel.unpackT(d) == t &&
        java.lang.Double.doubleToLongBits(PackedTvKernel.unpackV(d)) ==
          java.lang.Double.doubleToLongBits(v)
    })
  }

  test("decimal order ≡ (t, Double.compare(v)) lexicographic") {
    check(Prop.forAll(times, doubles, times, doubles) {
      (t1: Long, v1: Double, t2: Long, v2: Double) =>
        val c = PackedTvKernel.pack(t1, v1).toJavaBigDecimal
          .compareTo(PackedTvKernel.pack(t2, v2).toJavaBigDecimal)
        val want =
          if (t1 != t2) java.lang.Long.compare(t1, t2)
          else java.lang.Double.compare(v1, v2)
        Integer.signum(c) == Integer.signum(want)
    })
  }

  test("out-of-range t fails loudly instead of mis-ordering") {
    intercept[IllegalArgumentException] {
      PackedTvKernel.pack(Long.MaxValue / 2 + (1L << 62), 1.0)
    }
  }

  test("gridFillWide on a double column plans HashAggregate, no sort") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"k${i % 5}", i.toLong * 1000, i / 3.0))
      .toDF("series_key", "t", "v")
    val out = graft.query.AsOf.gridFillWide(
      df, Seq("series_key"), 0L, 200000L, 10000L, 50000L, Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // and the packed pick agrees with the struct form it replaced
    val expect = df.withColumn("__g",
        explode(sequence(
          (floor((col("t") - 1) / 10000) * 10000 + 10000).cast("long"),
          (floor((col("t") - 1) / 10000) * 10000 + 60000).cast("long"),
          lit(10000))))
      .where(col("__g").between(0, 200000) && col("t") >= col("__g") - 50000)
      .groupBy("series_key", "__g")
      .agg(max(struct(col("t").as("t"), col("v").as("v"))).as("m"))
      .select(col("series_key"), col("__g").as("t"),
        col("m.t").as("e_t"), col("m.v").as("e_v"))
    val bad = out.join(expect, Seq("series_key", "t"), "full")
      .where(!(col("v_t") <=> col("e_t")) || !(col("v_v") <=> col("e_v")))
    assert(bad.count() == 0)
  }

  test("duplicate timestamps resolve to the max value (packed = struct)") {
    import spark.implicits._
    // NaN is greatest under Spark's double order; −0.0/0.0 tie to +0.0
    val df = Seq(
      ("k", 1000L, 1.0), ("k", 1000L, Double.NaN), ("k", 1000L, 5.0),
      ("k2", 1000L, -0.0), ("k2", 1000L, 0.0))
      .toDF("series_key", "t", "v")
    val out = graft.query.AsOf.gridFillWide(
        df, Seq("series_key"), 0L, 10000L, 1000L, 1000L, Seq("v"))
      .where(col("t") === 1000L)
      .select("series_key", "v_v").as[(String, Double)].collect().toMap
    assert(out("k").isNaN)
    assert(java.lang.Double.doubleToLongBits(out("k2")) ==
      java.lang.Double.doubleToLongBits(0.0))
  }
}

/** [[ArgPick]] — the flat-slot argmin/argmax behind the rate family's
  * first/last picks. */
class ArgPickSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  test("ArgPick ≡ min_by/max_by(struct) on unique (t, v) keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // unique (t, v) per group (ties are unspecified in min_by too)
    val rows = (1 to 4000).map { i =>
      (s"k${i % 11}", i.toLong, rnd.nextInt(1000) / 7.0 + i * 1e-9,
        rnd.nextLong(), rnd.nextDouble())
    }
    val df = rows.toDF("g", "t", "v", "p1", "p2")
    val got = df.groupBy("g").agg(
      graft.catalyst.ArgPick.pick(max = false, Seq(
        "t" -> col("t"), "v" -> col("v"),
        "p1" -> col("p1"), "p2" -> col("p2"))).as("f"),
      graft.catalyst.ArgPick.pick(max = true, Seq(
        "t" -> col("t"), "v" -> col("v"),
        "p1" -> col("p1"), "p2" -> col("p2"))).as("l"))
    val want = df.groupBy("g").agg(
      min_by(struct(col("t"), col("v"), col("p1"), col("p2")),
        struct(col("t"), col("v"))).as("f"),
      max_by(struct(col("t"), col("v"), col("p1"), col("p2")),
        struct(col("t"), col("v"))).as("l"))
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
    // and the plan is hash-based with map-side combine
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
  }

  test("ArgPick: NaN greatest, duplicate t resolved by v, empty -> null") {
    import spark.implicits._
    val df = Seq(
      ("a", 5L, 1.0, 10L), ("a", 5L, Double.NaN, 20L), ("a", 3L, 9.0, 30L),
      ("b", 1L, -0.0, 40L))
      .toDF("g", "t", "v", "p")
    val out = df.groupBy("g").agg(
        graft.catalyst.ArgPick.pick(max = true, Seq(
          "t" -> col("t"), "v" -> col("v"), "p" -> col("p"))).as("l"))
      .select(col("g"), col("l.p")).as[(String, Long)].collect().toMap
    assert(out("a") == 20L) // NaN beats 1.0 at equal t
    assert(out("b") == 40L)
    // empty group via a filter that keeps the group key only
    val empty = df.where(col("t") > 100).groupBy("g").agg(
      graft.catalyst.ArgPick.pick(max = false,
        Seq("t" -> col("t"), "v" -> col("v"))).as("f"))
    assert(empty.count() == 0) // no groups at all — vacuous, pin shape
  }
}

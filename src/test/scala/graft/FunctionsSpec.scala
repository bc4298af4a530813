package graft

import org.apache.spark.sql.functions._

/** Column-function semantics, incl. the boundary cases the reference
  * pins in `db_test.go:1343-1437` (blocks are half-open `[mint, maxt)`,
  * buckets keyed by their exclusive upper bound). */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def bucket(ts: Long*): Seq[Long] =
    ts.toDF("t")
      .select(functions.rangeForTimestamp($"t", 100L).as("b"))
      .as[Long].collect().toSeq

  test("rangeForTimestamp uses floor semantics, not truncation toward zero") {
    // positive: t in [0,100) -> 100, [100,200) -> 200
    assert(bucket(0, 1, 99, 100, 199) == Seq(100L, 100L, 100L, 200L, 200L))
    // negative timestamps (pre-1970 data): floor(-1/100) = -1 -> bucket 0,
    // i.e. -1 lies in [-100, 0). Integer `div` would wrongly give 100.
    assert(bucket(-1, -100, -101) == Seq(0L, 0L, -100L))
    // every t satisfies the half-open invariant b-width <= t < b
    val all = Seq(-250L, -1L, 0L, 1L, 250L)
    all.zip(bucket(all: _*)).foreach { case (t, b) =>
      assert(b - 100 <= t && t < b, s"t=$t bucket=$b")
    }
  }

  test("interval clamp (block.go:648-656)") {
    val r = Seq((5L, 50L)).toDF("lo", "hi")
      .select(
        functions.clampLo($"lo", 10L).as("lo"),
        functions.clampHi($"hi", 40L).as("hi"))
      .as[(Long, Long)].head()
    assert(r == ((10L, 40L)))
  }
}

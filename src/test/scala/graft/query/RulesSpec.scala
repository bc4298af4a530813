package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hand fixtures for the rules engine over a sparse fill frame:
  * recording rules share one pass; alert `for`-runs break on stale
  * (absent) instants. */
class RulesSpec extends SparkSuite {
  import spark.implicits._

  // frame rows: (series_key, name, t, r_v) — series b is STALE at t=20
  private lazy val frame = Seq(
    ("a", "cpu", 10L, 1.0), ("a", "cpu", 20L, 2.0), ("a", "cpu", 30L, 3.0),
    ("b", "cpu", 10L, 10.0), ("b", "cpu", 30L, 30.0),
    ("c", "mem", 10L, 5.0), ("c", "mem", 20L, 5.0), ("c", "mem", 30L, 5.0)
  ).toDF("series_key", "name", "t", "r_v")

  test("recordingRules: one shared frame, per-rule grouping, global rule under grp=''") {
    val got = Rules.recordingRules(frame, Seq(
        Rules.Rule("by_name", Seq("name")),
        Rules.Rule("total", Seq.empty),
        Rules.Rule("max_by_name", Seq("name"), c => max(c))))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got(("by_name", "cpu", 10L)) == 11.0)
    assert(got(("by_name", "cpu", 20L)) == 2.0) // b stale: absent, not zero
    assert(got(("by_name", "mem", 30L)) == 5.0)
    assert(got(("total", "", 10L)) == 16.0)
    assert(got(("max_by_name", "cpu", 30L)) == 30.0)
    // 3 rules × their group×instant spaces, nothing else
    assert(got.size == 6 + 3 + 6)
  }

  test("alertFiring: a stale instant breaks the for-run; boundary instants can't fire") {
    // cond: r_v >= 1 (true everywhere present); for = 2 steps of 10
    val got = Rules.alertFiring(frame, col("r_v") >= 1.0, forSteps = 2, stepMs = 10L)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    // a: present 10,20,30 -> only t=30 has a full 3-instant run;
    // b: stale at 20 -> never fires; c: full run -> t=30
    assert(got == Set(("a", 30L), ("c", 30L)))

    // tighter condition: only b clears >9, but its true instants (10,
    // 30) are never adjacent — the stale 20 kills every for-run
    val none = Rules.alertFiring(frame, col("r_v") > 9.0, forSteps = 1, stepMs = 10L)
      .as[(String, Long, Double)].collect()
    assert(none.isEmpty)
  }
}

package graft.query

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("latest in-window right match per left row; same-instant wins; keys isolated") {
    val l = Seq(
      (1L, 1L, 100L, 1.0), (2L, 1L, 200L, 2.0),
      (3L, 1L, 1000L, 3.0), (4L, 2L, 100L, 4.0))
      .toDF("sample_id", "user_id", "t", "v")
    val r = Seq((1L, 50L, 5.0), (1L, 200L, 7.0), (2L, 90L, 9.0))
      .toDF("user_id", "t", "r_v")
    val got = AsOf.join(l, r, Seq("user_id"), lookbackMs = 300L)
      .select("sample_id", "r_t", "r_v")
      .as[(Long, Option[Long], Option[Double])]
      .collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(got(1L) == ((Some(50L), Some(5.0))))   // strictly-before match
    assert(got(2L) == ((Some(200L), Some(7.0))))  // same instant visible
    assert(got(3L) == ((None, None)))             // latest match too old -> null
    assert(got(4L) == ((Some(90L), Some(9.0))))   // other key's rows invisible
  }

  test("joinMany aligns N sides in one pass, equal to N separate joins") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 300L)).toDF("sample_id", "user_id", "t")
    val a = Seq((1L, 50L, 5.0), (1L, 250L, 6.0)).toDF("user_id", "t", "r_v")
    val b = Seq((1L, 90L, 9.0)).toDF("user_id", "t", "r_v")
    val many = AsOf.joinMany(l, Seq("a" -> a, "b" -> b), Seq("user_id"), 100L)
      .select("sample_id", "a_t", "a_v", "b_t", "b_v")
      .as[(Long, Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(many(1L) == ((Some(50L), Some(5.0), Some(90L), Some(9.0))))
    assert(many(2L) == ((Some(250L), Some(6.0), None, None))) // b too old at 300
    // one union-window shuffle resolves BOTH sides (no per-side pass)
    val plan = AsOf.joinMany(l, Seq("a" -> a, "b" -> b), Seq("user_id"), 100L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("joinWide: value columns fill independently; a null value never clobbers") {
    val l = Seq((1L, 1L, 300L)).toDF("sample_id", "user_id", "t")
    // at t=100 only a; at t=200 only b — b's null `a` must not erase a's fill
    val r = Seq(
      (1L, 100L, Some(5.0), Option.empty[Double]),
      (1L, 200L, Option.empty[Double], Some(9.0)))
      .toDF("user_id", "t", "a", "b")
    val got = AsOf.joinWide(l, r, Seq("user_id"), 1000L, Seq("a", "b"))
      .select("a_t", "a_v", "b_t", "b_v")
      .as[(Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect().head
    assert(got == ((Some(100L), Some(5.0), Some(200L), Some(9.0))))
  }

  test("gridLatest ≡ the general union-window path on a boundary-heavy grid") {
    import org.apache.spark.sql.functions._
    val step = 100L
    val lookback = 40L
    // instants 100..500; samples hit: exactly on an instant, exactly at
    // the inclusive horizon (g - lookback), just outside it, two in one
    // window (latest must win), and a key with no samples at all
    val r = Seq(
      (1L, 100L, 1.0),  // rt == g: same-instant visible at 100
      (1L, 160L, 2.0),  // 200-40=160: inclusive horizon edge -> fills 200
      (1L, 259L, 3.0),  // 300-41: outside window of 300 -> fills nothing
      (1L, 470L, 4.0), (1L, 480L, 5.0), // both in 500's window: 480 wins
      (2L, 310L, 6.0))
      .toDF("key", "t", "r_v")
    val grid = Seq(1L, 2L, 3L).toDF("key")
      .withColumn("t", explode(sequence(lit(step), lit(5 * step), lit(step))))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "t", "r_t", "r_v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val fast = norm(AsOf.gridLatest(grid, r, Seq("key"), step, lookback))
    val general = norm(AsOf.join(grid, r, Seq("key"), lookback))
    assert(fast == general)
    // and the specific edges hold
    val m = fast.map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    assert(m((1L, 100L)) == ((Some(100L), Some(1.0))))
    assert(m((1L, 200L)) == ((Some(160L), Some(2.0))))
    assert(m((1L, 300L)) == ((None, None)))
    assert(m((1L, 500L)) == ((Some(480L), Some(5.0))))
    assert(m((3L, 100L)) == ((None, None)))
    // the fast path must not carry a sample-scale sort: no Window at all
    val plan = AsOf.gridLatest(grid, r, Seq("key"), step, lookback)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    intercept[IllegalArgumentException] {
      AsOf.gridLatest(grid, r, Seq("key"), stepMs = 100L, lookbackMs = 100L)
    }
  }

  test("gridLatest on raw rows ≡ on the per-(key, t) max pre-aggregate " +
    "(the fused two-level max)") {
    import org.apache.spark.sql.functions._
    val step = 100L
    val lookback = 40L
    // duplicate-t rows are the discriminator: max(struct(t, v)) must
    // pick the max v AT the latest t — not any other row's v
    val raw = Seq(
      (1L, 180L, 7.0), (1L, 180L, 2.0),  // same t, different v: 7 wins
      (1L, 170L, 99.0),                  // earlier t, larger v: loses
      (2L, 280L, 1.0), (2L, 280L, 1.0),  // exact duplicate rows
      (2L, 300L, 5.0), (2L, 300L, 4.0))  // at the instant itself
      .toDF("key", "t", "r_v")
    val pre = raw.groupBy("key", "t").agg(max("r_v").as("r_v"))
    val grid = Seq(1L, 2L).toDF("key")
      .withColumn("t", explode(sequence(lit(step), lit(3 * step), lit(step))))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "t", "r_t", "r_v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val onRaw = norm(AsOf.gridLatest(grid, raw, Seq("key"), step, lookback))
    val onPre = norm(AsOf.gridLatest(grid, pre, Seq("key"), step, lookback))
    assert(onRaw == onPre)
    val m = onRaw.map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    assert(m((1L, 200L)) == ((Some(180L), Some(7.0))))
    assert(m((2L, 300L)) == ((Some(300L), Some(5.0))))
  }

  test("gridLatest ≡ union-window ≡ driver model over 50 seeded random fixtures") {
    import org.apache.spark.sql.functions._
    val step = 100L
    val lookback = 37L
    val rnd = new scala.util.Random(20260813L)
    // 50 fixtures × up to 40 samples, keys 0..2, t in [0, 600]; one
    // (fid, key) pair is the composite as-of key, so ONE pair of Spark
    // jobs exercises all fixtures
    val rows = (for {
      fid <- 0 until 50
      _ <- 0 until rnd.nextInt(40)
    } yield (fid.toLong, rnd.nextInt(3).toLong, rnd.nextInt(601).toLong,
      rnd.nextInt(100).toDouble))
      .distinctBy(r => (r._1, r._2, r._3)) // right unique per (keys, t)
    val r = rows.toDF("fid", "key", "t", "r_v")
    val grid = (0 until 50).map(_.toLong).toDF("fid")
      .crossJoin(Seq(0L, 1L, 2L).toDF("key"))
      .withColumn("t", explode(sequence(lit(step), lit(6 * step), lit(step))))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("fid", "key", "t", "r_t", "r_v")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect().toSet
    val fast = norm(AsOf.gridLatest(grid, r, Seq("fid", "key"), step, lookback))
    val general = norm(AsOf.join(grid, r, Seq("fid", "key"), lookback))
    assert(fast == general)
    // independent driver-side model
    val byKey = rows.groupBy(x => (x._1, x._2))
    val model = (for {
      fid <- (0 until 50).map(_.toLong)
      key <- Seq(0L, 1L, 2L)
      g <- (step to 6 * step by step)
    } yield {
      val hit = byKey.getOrElse((fid, key), Seq.empty)
        .filter(x => x._3 <= g && x._3 >= g - lookback)
        .sortBy(_._3).lastOption
      (fid, key, g, hit.map(_._3), hit.map(_._4))
    }).toSet
    assert(fast == model)
  }

  test("left rows with no right key at all survive with null fill") {
    val l = Seq((1L, 9L, 100L, 1.0)).toDF("sample_id", "user_id", "t", "v")
    val r = Seq((1L, 50L, 5.0)).toDF("user_id", "t", "r_v")
    val got = AsOf.join(l, r, Seq("user_id"), 1000L)
      .select("sample_id", "r_t").as[(Long, Option[Long])].collect()
    assert(got.toSeq == Seq((1L, None)))
  }

  test("ranged as-of join answers exactly like the default pricing") {
    val rnd = new scala.util.Random(20260814L)
    val l = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(500).toLong, 1.0))
      .toDF("sample_id", "user_id", "t", "v")
    val r = (0 until 100).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(500).toLong, rnd.nextInt(9).toDouble))
      .distinctBy(x => (x._1, x._2)).toDF("user_id", "t", "r_v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("sample_id", "r_t", "r_v")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(norm(AsOf.join(l, r, Seq("user_id"), 120L, ranged = true)) ==
      norm(AsOf.join(l, r, Seq("user_id"), 120L)))
  }

  test("gridFillWide: inclusive horizon, per-column independence, " +
    "all-null instants absent") {
    // step 100, lookback 200 (k = 2): the t=100 sample serves
    // g ∈ {100, 200, 300} — 300 by the INCLUSIVE horizon edge
    val r = Seq(
      (1L, 100L, Some(5.0), None: Option[Double]),
      (1L, 250L, None: Option[Double], Some(7.0)))
      .toDF("key", "t", "c", "p")
    val got = AsOf.gridFillWide(r, Seq("key"), 100L, 500L, 100L, 200L,
        Seq("c", "p"))
      .select("key", "t", "c_t", "c_v", "p_t", "p_v")
      .as[(Long, Long, Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect().toSet
    assert(got == Set(
      (1L, 100L, Some(100L), Some(5.0), None, None),
      (1L, 200L, Some(100L), Some(5.0), None, None),
      (1L, 300L, Some(100L), Some(5.0), Some(250L), Some(7.0)),
      (1L, 400L, None, None, Some(250L), Some(7.0))))
    // g=500: the t=250 candidate fails 250 >= 500-200 -> no row at all
  }

  test("gridFillWide ≡ joinWide's non-empty fill rows over seeded fixtures " +
    "(lookback ≥ step)") {
    import org.apache.spark.sql.functions._
    val step = 100L
    val lookback = 250L // k = 3, non-integral multiple of step
    val rnd = new scala.util.Random(20260814L)
    val rows = (for {
      fid <- 0 until 30
      _ <- 0 until rnd.nextInt(30)
    } yield (fid.toLong, rnd.nextInt(3).toLong, rnd.nextInt(601).toLong,
      if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None,
      if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None))
      .distinctBy(x => (x._1, x._2, x._3)) // joinWide needs unique (keys, t)
    val r = rows.toDF("fid", "key", "t", "c", "p")
    val (mint, maxt) = (step, 6 * step)
    val grid = (0 until 30).map(_.toLong).toDF("fid")
      .crossJoin(Seq(0L, 1L, 2L).toDF("key"))
      .withColumn("t", explode(sequence(lit(mint), lit(maxt), lit(step))))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("fid", "key", "t", "c_t", "c_v", "p_t", "p_v")
      .as[(Long, Long, Long, Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect().toSet
    val wide = norm(AsOf.joinWide(grid, r, Seq("fid", "key"), lookback, Seq("c", "p")))
    val sparse = norm(AsOf.gridFillWide(r, Seq("fid", "key"),
      mint, maxt, step, lookback, Seq("c", "p")))
    // every emitted instant carries exactly joinWide's fills there...
    assert(sparse.subsetOf(wide))
    // ...and every joinWide row with at least one fill is emitted
    assert(wide.filter(x => x._4.nonEmpty || x._6.nonEmpty).subsetOf(sparse))
  }
}

package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.matchers.{Eq, Matcher, Not, Re}

/** Randomized end-to-end differential test — the port of the reference's
  * `TestDB_e2e` (`db_test.go:639`) and `TestDelete_e2e`
  * (`head_test.go:619`): a pure in-memory model of (series, samples) is
  * maintained alongside the real store; random time ranges × matcher
  * sets must return exactly the model's answer through every lifecycle
  * stage — initial blocks, an overlapping re-ingest, matcher deletes,
  * and compaction. The pure [[Matcher.matches]] evaluator doubles as the
  * model's predicate, so the Column compiler is differentially checked
  * against it too. */
class DbE2eSpec extends SparkSuite {
  import spark.implicits._

  private val NumPoints = 300
  private val IntervalMs = 3L

  // the reference test's 8 label sets (db_test.go:645-696)
  private val labelSets: Seq[Map[String, String]] = for {
    a <- Seq("b", "c")
    instance <- Seq("localhost:9090", "127.0.0.1:9090")
    job <- Seq("prometheus", "prom-k8s")
  } yield Map("a" -> a, "instance" -> instance, "job" -> job)

  private def key(ls: Map[String, String]): String =
    ls.toSeq.sortBy(_._1).map { case (k, v) => s"""$k="$v"""" }
      .mkString("{", ",", "}")

  // deterministic values; exact in double
  private def value(si: Int, i: Int): Double = ((i * 31 + si * 7) % 97).toDouble / 4.0

  private case class P(sampleId: Long, t: Long, v: Double)
  private var model: Map[Map[String, String], Vector[P]] =
    labelSets.zipWithIndex.map { case (ls, si) =>
      ls -> (0 until NumPoints).map(i =>
        P(si * NumPoints + i, i * IntervalMs, value(si, i))).toVector
    }.toMap

  private def toDf(rows: Seq[(Map[String, String], P)]): DataFrame =
    rows.map { case (ls, p) => (p.sampleId, key(ls), ls, p.t, p.v) }
      .toDF("sample_id", "series_key", "labels", "t", "v")

  private lazy val store = new BlockStore(
    Files.createTempDirectory("graft-e2e").toString, blockRangeMs = 200L)

  private val matcherPool: Seq[Seq[Matcher]] = Seq(
    Seq(Eq("a", "b")),
    Seq(Re("instance", "127.+")),
    Seq(Eq("job", "prometheus"), Eq("a", "c")),
    Seq(Not(Eq("a", "b"))),
    Seq(Re("job", "prom.*"), Not(Re("instance", "local.*"))),
    Seq(Eq("missing", "")), // matches every series (label absent)
    Seq(Eq("a", "")), // matches no series (label always present)
    Seq())

  private def check(rng: scala.util.Random, queries: Int, stage: String): Unit = {
    val maxT = NumPoints * IntervalMs
    (0 until queries).foreach { qi =>
      val mint = rng.nextLong(maxT)
      val maxt = mint + rng.nextLong(maxT - mint + 1)
      val ms = matcherPool(rng.nextInt(matcherPool.length))
      // matchers resolve in the store's postings index (reference Select)
      val got = store.readRange(spark, mint, maxt, ms: _*)
        .select("series_key", "t", "v").as[(String, Long, Double)]
        .collect().toSeq.sorted
      val want = model.toSeq
        .filter { case (ls, _) => ms.forall(_.matches(ls)) }
        .flatMap { case (ls, ps) =>
          ps.filter(p => p.t >= mint && p.t <= maxt)
            .map(p => (key(ls), p.t, p.v))
        }.sorted
      assert(got == want,
        s"$stage q$qi [$mint,$maxt] $ms: got ${got.size} want ${want.size}")
    }
  }

  test("db e2e: random range+matcher queries match the model across the lifecycle") {
    val rng = new scala.util.Random(42)

    // stage 1: three time-chunked blocks (like head->block persistence)
    val all = model.toSeq.flatMap { case (ls, ps) => ps.map(ls -> _) }
    val byChunk = all.groupBy { case (_, p) => (p.t / 300L).min(2L) }
    (0L to 2L).foreach(c => store.write(toDf(byChunk(c))))
    check(rng, 6, "blocks")

    // stage 2: overlapping re-ingest with AMENDED values for one series
    // in [150, 450]. Recency is MIN-TIME order (db.go:386-388, pinned by
    // the VerticalCompactionSpec table): the amended block (mint 150)
    // wins over chunk 0 (mint 0) but LOSES to chunk 1 (mint 300), so
    // only [150, 299] actually amends — an amend must not start before
    // the block it corrects.
    val target = labelSets(3)
    val rewrite = model(target)
      .filter(p => p.t >= 150 && p.t <= 450)
      .map(p => p.copy(v = p.v + 1000))
    store.write(toDf(rewrite.map(target -> _)))
    model = model.updated(target,
      model(target).map(p =>
        if (p.t >= 150 && p.t <= 299) p.copy(v = p.v + 1000) else p))
    check(rng, 6, "overlap")

    // stage 3: two matcher deletes (TestDelete_e2e shape)
    store.delete(spark, 100, 250, Eq("a", "b"))
    model = model.map { case (ls, ps) =>
      ls -> (if (Eq("a", "b").matches(ls)) ps.filterNot(p => p.t >= 100 && p.t <= 250) else ps)
    }
    store.delete(spark, 400, 500, Re("job", "prom-k8s"), Eq("a", "c"))
    model = model.map { case (ls, ps) =>
      ls -> (if (Re("job", "prom-k8s").matches(ls) && Eq("a", "c").matches(ls))
        ps.filterNot(p => p.t >= 400 && p.t <= 500)
      else ps)
    }
    check(rng, 6, "deletes")

    // stage 3b: cleanTombstones applies the deletes physically without
    // merging (block boundaries preserved, manifest intervals cleared,
    // TestTombstoneClean db_test.go:875); answers must be unchanged
    val nBlocks = store.manifest.blocks.size
    store.cleanTombstones(spark)
    assert(store.manifest.blocks.size == nBlocks)
    assert(store.manifest.tombstones.isEmpty &&
      store.manifest.tombstoneFiles.isEmpty)
    check(rng, 6, "cleaned")

    // stage 4: compact everything; answers must be unchanged
    store.compact(spark, store.manifest.blocks.map(_.blockId))
    assert(store.manifest.blocks.size == 1)
    check(rng, 6, "compacted")

    // stage 5: a rolled-back append registers its series (visible to
    // label metadata, zero samples) and must not perturb ANY sample
    // query; head truncation then GCs it
    val ghost = Map("a" -> "ghost", "instance" -> "localhost:9090", "job" -> "prometheus")
    graft.ingest.Appender.txn(store, minValidTime = 0)
      .add(toDf(Seq(ghost -> P(999999L, 0L, 1.0))).withColumnRenamed("sample_id", "arrival"))
      .rollback()
    assert(store.labelValues(spark, "a").as[String].collect().toSeq ==
      Seq("b", "c", "ghost"))
    assert(store.readRange(spark, 0, NumPoints * IntervalMs, Eq("a", "ghost")).count() == 0)
    check(rng, 6, "rollback")
    store.truncateHead()
    assert(store.labelValues(spark, "a").as[String].collect().toSeq == Seq("b", "c"))
    check(rng, 3, "truncated")
  }
}

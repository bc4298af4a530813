package graft.storage

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.matchers.Matcher

/** Property tests over the pure kernels — the ScalaCheck analogue of the
  * reference's randomized fuzz loops (SURVEY §5; `wal/reader_test.go:311`
  * TestReaderFuzz spirit): planner invariants vs brute-force models,
  * manifest round-trips, matcher set-regex parsing. */
class PropertySpec extends AnyFunSuite {

  /** scalatestplus isn't on the (offline) classpath; run ScalaCheck
    * directly and surface failures as assertions. */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genMeta: Gen[BlockMeta] = for {
    id <- Gen.choose(1L, 1000L)
    mint <- Gen.choose(-500L, 500L)
    len <- Gen.choose(1L, 300L)
    ns <- Gen.choose(0L, 100L)
    nt <- Gen.choose(0L, 20L)
    by <- Gen.choose(0L, 1L << 30)
  } yield BlockMeta(id, mint, mint + len, ns * 10, ns, nt, by)

  private def genMetas(maxN: Int): Gen[List[BlockMeta]] =
    Gen.choose(0, maxN).flatMap(n => Gen.listOfN(n, genMeta))
      .map(_.distinctBy(_.blockId))

  test("overlappingGroups matches a brute-force transitive-closure model") {
    check(Prop.forAll(genMetas(12)) { metas =>
      val groups = Compaction.overlappingGroups(metas)
      // model: union-find over pairwise overlaps of half-open intervals
      val parent = scala.collection.mutable.Map.from(metas.map(m => m.blockId -> m.blockId))
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for {
        a <- metas; b <- metas
        if a.blockId < b.blockId && a.mint < b.maxt && b.mint < a.maxt
      } parent(find(a.blockId)) = find(b.blockId)
      val modelGroups = metas.groupBy(m => find(m.blockId)).values
        .filter(_.size > 1)
        .map(_.map(_.blockId).toSet).toSet
      val gotGroups = groups.map(_.map(_.blockId).toSet).toSet
      gotGroups == modelGroups
    })
  }

  test("splitByRange: every group fits one aligned window; no block is lost unless it straddles") {
    check(Prop.forAll(genMetas(12), Gen.choose(10L, 200L)) { (metas, tr) =>
      val sorted = metas.sortBy(m => (m.mint, m.maxt, m.blockId))
      val groups = Compaction.splitByRange(sorted, tr)
      val windowOk = groups.forall { g =>
        val t0 = {
          val m = g.head.mint
          if (m >= 0) tr * (m / tr) else tr * ((m - tr + 1) / tr)
        }
        g.forall(b => b.mint >= t0 && b.maxt <= t0 + tr)
      }
      val covered = groups.flatten.map(_.blockId).toSet
      val straddlers = sorted.filterNot(b => covered.contains(b.blockId))
      // a skipped block must genuinely not fit any aligned window
      val skipOk = straddlers.forall { b =>
        val t0 = if (b.mint >= 0) tr * (b.mint / tr) else tr * ((b.mint - tr + 1) / tr)
        b.maxt > t0 + tr
      }
      windowOk && skipOk
    })
  }

  test("plan always returns a subset of its input, never the freshest non-overlapping block") {
    val ranges = Seq(20L, 60L, 180L, 540L)
    check(Prop.forAll(genMetas(10)) { metas =>
      val planned = Compaction.plan(metas, ranges)
      val ids = metas.map(_.blockId).toSet
      val subset = planned.forall(m => ids.contains(m.blockId))
      val freshOk =
        Compaction.selectOverlapping(metas.sortBy(m => (m.mint, m.maxt, m.blockId))).nonEmpty ||
          metas.isEmpty || planned.isEmpty || {
            val freshest = metas.maxBy(m => (m.mint, m.maxt, m.blockId))
            !planned.exists(_.blockId == freshest.blockId)
          }
      subset && freshOk
    })
  }

  test("manifest publish/load round-trips any state") {
    val genKey = Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => "{x=\"" + cs.mkString + "\"}")
    val genTomb = for {
      k <- genKey; lo <- Gen.choose(-1000L, 1000L); len <- Gen.choose(0L, 100L)
    } yield TombstoneInterval(k, lo, lo + len)
    val genState = for {
      bs <- genMetas(8)
      ts <- Gen.listOf(genTomb)
    } yield ManifestState(bs.sortBy(_.blockId), ts)
    val root = java.nio.file.Files.createTempDirectory("graft-prop-manifest").toString
    check(Prop.forAll(genState) { st =>
      Manifest.publish(root, st)
      val back = Manifest.load(root)
      back.blocks == st.blocks && back.tombstones.toSet == st.tombstones.toSet
    })
  }

  test("set-regex parsing: any literal alternation round-trips; meta-chars never parse") {
    val lit = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '-', ':')))
      .map(_.mkString)
    check(Prop.forAll(Gen.nonEmptyListOf(lit)) { parts =>
      Matcher.setMatches(parts.mkString("|")).contains(parts) &&
        Matcher.anchoredSetMatches("^(?:" + parts.mkString("|") + ")$").contains(parts)
    })
    check(Prop.forAll(lit) { s =>
      Matcher.setMatches(s + ".*").isEmpty && Matcher.setMatches(s + "+").isEmpty
    })
  }
}

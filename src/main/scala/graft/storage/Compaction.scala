package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-block metadata — the reference's `BlockMeta` (`block.go:152-200`):
  * half-open time range `[mint, maxt)`, stats, and on-disk size. The
  * `blockId` is a monotone write sequence, which doubles as the vertical
  * merge recency ("later block wins", `querier.go:1039-1042`) the way the
  * reference uses ULID ordering.
  */
final case class BlockMeta(
    blockId: Long,
    mint: Long,
    maxt: Long, // exclusive
    numSamples: Long,
    numSeries: Long,
    numTombstones: Long,
    bytes: Long) {

  /** Closed-interval overlap vs a query range (reference
    * `OverlapsClosedInterval`, `block.go:636-641`: blocks are half-open). */
  def overlaps(qmint: Long, qmaxt: Long): Boolean =
    mint <= qmaxt && maxt > qmint
}

/** A deletion interval for one series: closed `[mint, maxt]`
  * (`tombstones.go:237-257`). Persisted inside the manifest version so
  * tombstones and the block list swap atomically together. */
final case class TombstoneInterval(seriesKey: String, mint: Long, maxt: Long)

/** One immutable published state of the store: live blocks + tombstones.
  * The reference's equivalent is the block list swapped under `db.mtx`
  * plus per-block tombstone files (`db.go:775-779`). `highWater` is the
  * largest block id ever published — ids are NEVER reused even after
  * retention/compaction retires blocks, so a stale on-disk dir (not yet
  * vacuumed) can never be mistaken for a new block's data or index. */
final case class ManifestState(
    blocks: Seq[BlockMeta],
    tombstones: Seq[TombstoneInterval],
    highWater: Long = 0L) {
  def nextBlockId: Long =
    blocks.map(_.blockId).foldLeft(highWater)(math.max) + 1
}

/** Versioned, atomically-published manifest — the reference's
  * `meta.json` tmp+fsync+rename pattern (`block.go:207-264`,
  * `compact.go:634-639`) applied to the whole block list: each publish
  * writes `MANIFEST-<n+1>` via a temp file + atomic rename; readers use
  * the highest complete version. Tab-separated text, longs only plus the
  * series key (which never contains tabs/newlines by construction).
  */
object Manifest {
  private val Prefix = "MANIFEST-"

  private def dir(root: String): Path = Paths.get(root, "meta")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getFileName.toString
    if (n.startsWith(Prefix)) n.stripPrefix(Prefix).toLongOption else None
  }

  def currentVersion(root: String): Long = {
    val d = dir(root)
    if (!Files.isDirectory(d)) 0L
    else {
      val s = Files.list(d)
      try s.iterator.asScala.flatMap(versionOf).foldLeft(0L)(math.max)
      finally s.close()
    }
  }

  def load(root: String): ManifestState = {
    val v = currentVersion(root)
    if (v == 0L) ManifestState(Nil, Nil)
    else {
      val lines = Files.readAllLines(dir(root).resolve(Prefix + "%09d".format(v))).asScala
      val blocks = Seq.newBuilder[BlockMeta]
      val tombs = Seq.newBuilder[TombstoneInterval]
      var hw = 0L
      lines.foreach { line =>
        line.split('\t') match {
          case Array("B", id, mint, maxt, ns, nser, nt, by) =>
            blocks += BlockMeta(id.toLong, mint.toLong, maxt.toLong,
              ns.toLong, nser.toLong, nt.toLong, by.toLong)
          case Array("T", key, mint, maxt) =>
            tombs += TombstoneInterval(key, mint.toLong, maxt.toLong)
          case Array("H", id) => hw = id.toLong
          case _ => // ignore unknown record kinds (forward compat)
        }
      }
      val bs = blocks.result()
      ManifestState(bs, tombs.result(),
        bs.map(_.blockId).foldLeft(hw)(math.max))
    }
  }

  /** Publish the next version: temp file + atomic rename, the same
    * two-step the reference uses for every meta write. */
  def publish(root: String, state: ManifestState): Long = {
    val d = dir(root)
    Files.createDirectories(d)
    val next = currentVersion(root) + 1
    val body = new StringBuilder
    val hw = state.blocks.map(_.blockId).foldLeft(state.highWater)(math.max)
    body ++= s"H\t$hw\n"
    state.blocks.sortBy(_.blockId).foreach { b =>
      body ++= s"B\t${b.blockId}\t${b.mint}\t${b.maxt}\t${b.numSamples}\t${b.numSeries}\t${b.numTombstones}\t${b.bytes}\n"
    }
    state.tombstones.foreach { t =>
      require(!t.seriesKey.exists(c => c == '\t' || c == '\n'),
        s"series key not manifest-safe: ${t.seriesKey}")
      body ++= s"T\t${t.seriesKey}\t${t.mint}\t${t.maxt}\n"
    }
    val tmp = Files.createTempFile(d, ".tmp-manifest", "")
    Files.writeString(tmp, body.toString)
    Files.move(tmp, d.resolve(Prefix + "%09d".format(next)),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }
}

/** Compaction planning — the reference's `LeveledCompactor.plan`
  * (`compact.go:211-329`) over block metas: overlapping blocks first,
  * then exponential-range grouping, then large blocks with >5%
  * tombstones. Pure functions over [[BlockMeta]]; the Spark rewrite that
  * consumes a plan lives in [[BlockStore.compact]].
  */
object Compaction {

  /** Exponential block ranges (reference `ExponentialBlockRanges`,
    * `compact.go:41-50`; defaults 2h × 3^k, `db.go:48-55`). */
  def exponentialRanges(minMs: Long, steps: Int, factor: Int = 3): Seq[Long] =
    Iterator.iterate(minMs)(_ * factor).take(steps).toSeq

  /** The plan: which blocks to compact into one, or empty for "nothing
    * to do" (`compact.go:190-254`). Input order is irrelevant; output is
    * mint-ordered. */
  def plan(metas: Seq[BlockMeta], ranges: Seq[Long]): Seq[BlockMeta] = {
    val dms = metas.sortBy(m => (m.mint, m.maxt, m.blockId))

    val overlapping = selectOverlapping(dms)
    if (overlapping.nonEmpty) return overlapping

    if (dms.isEmpty) return Nil
    // Skip the freshest block (max mint): gives writers a full block's
    // window to backfill without racing compaction (`compact.go:199-202`).
    val settled = dms.dropRight(1)

    val ranged = selectRanges(settled, ranges)
    if (ranged.nonEmpty) return ranged

    // Large blocks with >5% tombstoned series (`compact.go:211-220`).
    settled.reverseIterator
      .takeWhile(m => m.maxt - m.mint >= ranges(ranges.length / 2))
      .find(m => m.numTombstones.toDouble / (m.numSeries + 1) > 0.05)
      .toSeq
  }

  /** First run of time-overlapping blocks, in mint order (reference
    * `selectOverlappingDirs`, `compact.go:264-286`). */
  def selectOverlapping(sorted: Seq[BlockMeta]): Seq[BlockMeta] = {
    if (sorted.length < 2) return Nil
    val out = Seq.newBuilder[BlockMeta]
    var n = 0
    var globalMaxt = sorted.head.maxt
    var i = 1
    var done = false
    while (i < sorted.length && !done) {
      val d = sorted(i)
      if (d.mint < globalMaxt) {
        if (n == 0) { out += sorted(i - 1); n += 1 }
        out += d; n += 1
      } else if (n > 0) done = true
      if (d.maxt > globalMaxt) globalMaxt = d.maxt
      i += 1
    }
    out.result()
  }

  /** Range-grouping selection (reference `selectDirs`,
    * `compact.go:227-262`): walk the range ladder coarse-ward, pick the
    * first multi-block group that either fills its range exactly or lies
    * wholly before the most recent block. */
  def selectRanges(ds: Seq[BlockMeta], ranges: Seq[Long]): Seq[BlockMeta] = {
    if (ranges.length < 2 || ds.isEmpty) return Nil
    val highTime = ds.last.mint
    ranges.tail.foreach { iv =>
      splitByRange(ds, iv).foreach { p =>
        val mint = p.head.mint
        val maxt = p.last.maxt
        if ((maxt - mint == iv || maxt <= highTime) && p.length > 1)
          return p
      }
    }
    Nil
  }

  /** Partition mint-sorted blocks into aligned windows of size `tr`,
    * skipping blocks that straddle a window boundary (reference
    * `splitByRange`, `compact.go:289-329`). */
  def splitByRange(ds: Seq[BlockMeta], tr: Long): Seq[Seq[BlockMeta]] = {
    val out = Seq.newBuilder[Seq[BlockMeta]]
    var i = 0
    while (i < ds.length) {
      val m = ds(i)
      val t0 =
        if (m.mint >= 0) tr * (m.mint / tr)
        else tr * ((m.mint - tr + 1) / tr)
      if (m.maxt > t0 + tr) i += 1
      else {
        val group = Seq.newBuilder[BlockMeta]
        while (i < ds.length && ds(i).maxt <= t0 + tr) {
          group += ds(i)
          i += 1
        }
        val g = group.result()
        if (g.nonEmpty) out += g
      }
    }
    out.result()
  }

  /** All maximal groups of mutually-overlapping blocks (reference
    * `OverlappingBlocks`, `db.go:942-990`; test
    * `db_test.go:1250` TestOverlappingBlocksDetectsAllOverlaps). Used by
    * the read path to decide vertical-merge querying. */
  def overlappingGroups(metas: Seq[BlockMeta]): Seq[Seq[BlockMeta]] = {
    val sorted = metas.sortBy(m => (m.mint, m.maxt, m.blockId))
    val groups = Seq.newBuilder[Seq[BlockMeta]]
    var cur = List.empty[BlockMeta]
    var curMax = Long.MinValue
    sorted.foreach { m =>
      if (cur.nonEmpty && m.mint < curMax) {
        cur = m :: cur
        if (m.maxt > curMax) curMax = m.maxt
      } else {
        if (cur.length > 1) groups += cur.reverse
        cur = List(m)
        curMax = m.maxt
      }
    }
    if (cur.length > 1) groups += cur.reverse
    groups.result()
  }
}

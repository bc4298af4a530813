package graft.storage

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.rangeForTimestamp
import graft.matchers.Matcher

/** Physical block storage with a versioned manifest — the Spark-native
  * reading of the reference's block lifecycle:
  *
  *  - a *block* is one immutable write: `data/block_id=<n>/t_bucket=<b>/`
  *    parquet, sorted by (series_key, t). Parquet row groups play the
  *    chunk role (min/max skip-scan); `t_bucket` partition dirs give
  *    time pruning; the `block_id` dir is the unit of publication and
  *    deletion (reference block dirs, `block.go:266-289`);
  *  - the [[Manifest]] is the atomically-swapped block list + tombstone
  *    set (reference `db.reload` block-list swap `db.go:775-779` +
  *    `tombstones` files). Readers see only manifest-listed blocks, so a
  *    half-written block dir is invisible until published — the tmp +
  *    rename discipline of `compact.go:634-639` at list granularity;
  *  - every write also materializes the block's `(label_name,
  *    label_value)` dictionary under `dict/block_id=<n>/` — the
  *    label-value index of the reference (`index/index.go:404-448`),
  *    which the query layer uses to answer regex matchers without
  *    scanning sample rows ([[graft.query.Querier.selectViaDictionary]]).
  *
  * Scale notes: the manifest is O(#blocks) driver-side metadata (the
  * reference holds the same list in memory); retention and compaction
  * planning read ONLY the manifest, never the data. Reads prune on the
  * (block_id, t_bucket) partition columns. Overlap handling is decided
  * per query from manifest intervals — the reference's automatic
  * vertical-querier selection (`db.go:1185-1195`) — so the dedup window
  * (one shuffle on series_key) is paid only when overlap exists.
  */
final class BlockStore(
    val root: String,
    val blockRangeMs: Long,
    /** Writer tasks per block bucket: each bucket's rows hash into this
      * many shuffle keys (by series), so a bucket is written by W tasks
      * in parallel and produces ≤ W files — W=1 serializes a bucket
      * into one task at cluster scale, while hashing on raw series_key
      * would spray every bucket across ALL tasks (thousands of tiny
      * files at small scale, footer overhead dominating). Size W so
      * bucketBytes/W fits one task comfortably. */
    val writersPerBucket: Int = 8) {
  def dataDir = s"$root/data"
  private[storage] def dictDir = s"$root/dict"
  private def blockPath(id: Long) = s"$dataDir/block_id=$id"

  /** Current published state (block list + tombstones). */
  def manifest: ManifestState = Manifest.load(root)

  private def du(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }

  /** Append one immutable block; returns its id. One shuffle keyed on
    * (t_bucket, series_key) — hashing the series into the key keeps
    * every executor writing (hashing t_bucket alone would serialize
    * each bucket into a single task at cluster scale); the in-task sort
    * leads with t_bucket so the partitioned writer's required ordering
    * is already satisfied and the (series_key, t) run order inside each
    * file — what makes row-group stats tight — survives. Stats for the
    * manifest come from the write's own input, never from re-reading
    * published data. */
  def write(samples: DataFrame): Long = {
    val st = manifest
    val id = st.nextBlockId
    // Normalized storage, like the reference's series dictionary
    // (`index/index.go:113-137`): the per-row labels map is redundant —
    // label pairs live once per series in the block's postings index,
    // sample rows carry only the series key (dictionary-encoded by
    // parquet) + (t, v). Cuts block bytes ~2-3× and every downstream
    // shuffle of read samples.
    samples
      .drop("labels")
      .withColumn("t_bucket", rangeForTimestamp(col("t"), blockRangeMs))
      .repartition(col("t_bucket"),
        pmod(xxhash64(col("series_key")), lit(writersPerBucket)))
      .sortWithinPartitions(col("t_bucket"), col("series_key"), col("t"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("t_bucket")
      .parquet(blockPath(id))
    if (samples.columns.contains("labels"))
      graft.query.Postings.fromSamples(samples)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$dictDir/block_id=$id")
    // stats from the files just written (not from re-executing the input
    // lineage): a cheap local scan that is guaranteed to agree with the
    // bytes on disk, the way the reference derives meta from the block
    val spark = samples.sparkSession
    val r = spark.read.parquet(blockPath(id)).agg(
      min("t"), max("t"), count(lit(1)), countDistinct("series_key")).head()
    require(!r.isNullAt(0), "refusing to publish an empty block")
    val meta = BlockMeta(
      blockId = id,
      mint = r.getLong(0),
      maxt = r.getLong(1) + 1, // half-open (db.go:634-641)
      numSamples = r.getLong(2),
      numSeries = r.getLong(3),
      numTombstones = 0L,
      bytes = du(blockPath(id)))
    Manifest.publish(root, st.copy(blocks = st.blocks :+ meta))
    id
  }

  private def readBlocks(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    val df = spark.read.option("basePath", dataDir)
      .parquet(ids.map(blockPath): _*)
    df
  }

  /** All live samples, raw (no dedup/tombstone application). */
  def read(spark: SparkSession): DataFrame = {
    val ids = manifest.blocks.map(_.blockId)
    require(ids.nonEmpty, s"block store at $root has no published blocks")
    readBlocks(spark, ids)
  }

  /** Tombstones of the current manifest as a DataFrame. */
  def tombstoneTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    manifest.tombstones
      .map(t => (t.seriesKey, t.mint, t.maxt))
      .toDF("series_key", "mint", "maxt")
  }

  /** The read path (reference `db.Querier`, `db.go:1150-1196`): select
    * manifest blocks overlapping the closed `[mint, maxt]`, and apply
    * vertical dedup-merge iff those blocks overlap *each other* — the
    * automatic `verticalQuerier` switch (`db.go:1185-1195`) that makes
    * re-ingested/backfilled data read correctly with later-block-wins
    * semantics. Tombstoned intervals are filtered via broadcast range
    * anti-join when any exist. */
  def readRange(spark: SparkSession, mint: Long, maxt: Long, matchers: Matcher*): DataFrame = {
    val st = manifest
    val live = st.blocks.filter(_.overlaps(mint, maxt))
    if (live.isEmpty)
      return read(spark).where(lit(false)).drop("block_id", "t_bucket")
    val raw0 = readBlocks(spark, live.map(_.blockId))
      .where(col("t") >= lit(mint) && col("t") <= lit(maxt))
    // matcher selection resolves ENTIRELY in the postings index — the
    // reference's Select never evaluates matchers on sample data
    // (`querier.go:326-396`); the fact side gets one broadcast semi-join
    val raw =
      if (matchers.isEmpty) raw0
      else {
        val idx = postingsIndex(spark)
        val keys = graft.query.Postings.seriesFor(
          idx, idx.select("series_key").distinct(), matchers)
        raw0.join(broadcast(keys), Seq("series_key"), "left_semi")
      }
    val vertical = Compaction.overlappingGroups(live).nonEmpty
    val merged =
      if (vertical) Merge.dedupLatest(raw, seqCol = "block_id")
      else raw
    val withTombs =
      if (st.tombstones.isEmpty) merged
      else Tombstones.applyTo(merged, tombstoneTable(spark))
    withTombs.drop("block_id", "t_bucket")
  }

  /** Union of the live blocks' persisted inverted indexes (S12,
    * reference `index/index.go:140-147`): one `(label_name, label_value,
    * series_key)` row per label pair per series — the postings table
    * [[graft.query.Postings.select]] runs matcher set algebra over. */
  def postingsIndex(spark: SparkSession): DataFrame = {
    val ids = manifest.blocks.map(_.blockId)
    require(ids.nonEmpty, s"block store at $root has no published blocks")
    // fail loudly rather than answer from a partial index: a block
    // written from label-less samples (e.g. a streaming sink) has no
    // postings, so label/matcher queries over this store are undefined
    val missing = ids.filterNot(id =>
      Files.isDirectory(Paths.get(s"$dictDir/block_id=$id")))
    require(missing.isEmpty,
      s"store at $root has no label index for blocks ${missing.mkString(",")} " +
        "(written without a labels column); label/matcher queries unavailable")
    spark.read.option("basePath", dictDir)
      .parquet(ids.map(id => s"$dictDir/block_id=$id"): _*)
      .select("label_name", "label_value", "series_key")
      .distinct()
  }

  /** The `(name, value)` dictionary view of [[postingsIndex]] — what
    * regex matchers are evaluated against (reference enumerates label
    * values per matcher, `index/index.go:866-892`), so a regex never
    * scans sample rows. */
  def labelDictionary(spark: SparkSession): DataFrame =
    postingsIndex(spark)
      .select("label_name", "label_value")
      .distinct()

  /** A1 over the store: distinct label names from the index alone
    * (reference `querier.go:70-89` reads only index sections). */
  def labelNames(spark: SparkSession): DataFrame =
    postingsIndex(spark).select(col("label_name")).distinct().orderBy("label_name")

  /** A2 over the store: sorted distinct values of one label, index-only
    * (reference `querier.go:91-108`). */
  def labelValues(spark: SparkSession, name: String): DataFrame =
    postingsIndex(spark)
      .where(col("label_name") === name)
      .select(col("label_value")).distinct().orderBy("label_value")

  /** Record deletion intervals for every series matching the conjunction
    * over `[mint, maxt]` (reference `DB.Delete`, `db.go:1203-1232`):
    * series resolve in the postings index alone — no sample data is
    * read — then the intervals (coalesced per series) publish in the
    * next manifest version. Per-block tombstone counters feed the
    * compaction planner's >5% trigger (`compact.go:211-220`). The
    * resolved set is series-cardinality metadata, same bound the
    * reference's in-memory tombstone list has. */
  def delete(spark: SparkSession, mint: Long, maxt: Long, matchers: Matcher*): Unit = {
    val idx = postingsIndex(spark)
    val keys = graft.query.Postings
      .seriesFor(idx, idx.select("series_key").distinct(), matchers)
      .collect().map(_.getString(0))
    val st = manifest
    val added = keys.map(k => TombstoneInterval(k, mint, maxt)).toSeq
    val all = coalesce(st.tombstones ++ added)
    val blocks = st.blocks.map { b =>
      val n = all.count(t => t.mint < b.maxt && t.maxt >= b.mint)
      b.copy(numTombstones = n)
    }
    Manifest.publish(root, st.copy(blocks = blocks, tombstones = all))
  }

  /** Driver-side interval coalescing per series (reference
    * `Intervals.add`, `tombstones.go:259-304`) — the tombstone set is
    * small metadata, so this needs no Spark job. */
  private def coalesce(ts: Seq[TombstoneInterval]): Seq[TombstoneInterval] =
    ts.groupBy(_.seriesKey).toSeq.sortBy(_._1).flatMap { case (key, ivs) =>
      val sorted = ivs.sortBy(t => (t.mint, t.maxt))
      sorted.tail.foldLeft(List(sorted.head)) { (acc, iv) =>
        val h = acc.head
        if (iv.mint <= h.maxt + 1) h.copy(maxt = math.max(h.maxt, iv.maxt)) :: acc.tail
        else iv :: acc
      }.reverse.map(i => TombstoneInterval(key, i.mint, i.maxt))
    }

  /** Compaction plan over the current manifest (reference `Plan`,
    * `compact.go:190-254`): block ids to merge next, or empty. */
  def planCompaction(ranges: Seq[Long]): Seq[Long] =
    Compaction.plan(manifest.blocks, ranges).map(_.blockId)

  /** Merge the given blocks into one new block (reference `Compact`,
    * `compact.go:373-464` + `populateBlock`): vertical dedup
    * (later block_id wins), physical tombstone drop, one sorted write,
    * then an atomic manifest swap that retires the inputs. Tombstone
    * intervals that no longer touch any remaining block are dropped
    * (`CleanTombstones`, `db.go:1234-1261`). */
  def compact(spark: SparkSession, ids: Seq[Long]): Option[Long] = {
    if (ids.size < 1) return None
    val st = manifest
    val newId = st.nextBlockId
    val inputs = st.blocks.filter(b => ids.contains(b.blockId))
    require(inputs.size == ids.size, s"unknown block ids in $ids")
    val raw = readBlocks(spark, ids)
    val deduped = Merge.dedupLatest(raw, seqCol = "block_id")
    val cleaned =
      if (st.tombstones.isEmpty) deduped
      else Tombstones.applyTo(deduped, tombstoneTable(spark))
    cleaned
      .drop("block_id") // t_bucket recomputed: partition col, not data
      .withColumn("t_bucket", rangeForTimestamp(col("t"), blockRangeMs))
      .repartition(col("t_bucket"),
        pmod(xxhash64(col("series_key")), lit(writersPerBucket)))
      .sortWithinPartitions(col("t_bucket"), col("series_key"), col("t"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("t_bucket")
      .parquet(blockPath(newId))
    if (Files.isDirectory(Paths.get(dictDir))) {
      val dictIds = ids.filter(id => Files.isDirectory(Paths.get(s"$dictDir/block_id=$id")))
      if (dictIds.nonEmpty)
        spark.read.option("basePath", dictDir)
          .parquet(dictIds.map(id => s"$dictDir/block_id=$id"): _*)
          .select("label_name", "label_value", "series_key").distinct()
          .write.mode(SaveMode.Overwrite).parquet(s"$dictDir/block_id=$newId")
    }
    val out = spark.read.parquet(blockPath(newId))
    val r = out.agg(
      min("t"), max("t"), count(lit(1)), countDistinct("series_key")).head()
    val keep = st.blocks.filterNot(b => ids.contains(b.blockId))
    // drop intervals now fully applied (touch no surviving block)
    val tombs = st.tombstones.filter(t =>
      keep.exists(b => t.mint < b.maxt && t.maxt >= b.mint))
    val meta =
      if (r.isNullAt(0)) None // everything tombstoned away
      else Some(BlockMeta(newId, r.getLong(0), r.getLong(1) + 1,
        r.getLong(2), r.getLong(3), 0L, du(blockPath(newId))))
    val newBlocks = (keep ++ meta).map { b =>
      b.copy(numTombstones = tombs.count(t => t.mint < b.maxt && t.maxt >= b.mint))
    }
    // newId enters the high-water even if the compacted block came out
    // empty (everything tombstoned): its id must still never be reused
    Manifest.publish(root, st.copy(blocks = newBlocks, tombstones = tombs,
      highWater = math.max(st.highWater, newId)))
    meta.map(_.blockId)
  }

  /** Manifest-only retention (reference `db.go:847-906`): blocks wholly
    * older than `keepMs` behind the newest block, then — newest first —
    * blocks past the `maxBytes` budget. Reads NO data (the round-1
    * driver-side max(t) scan is gone); publishing the shrunken list is
    * the atomic delete, [[vacuum]] reclaims disk later. Returns dropped
    * metas. */
  def applyRetention(keepMs: Long = 0L, maxBytes: Long = 0L): Seq[BlockMeta] = {
    val st = manifest
    if (st.blocks.isEmpty) return Nil
    val newestFirst = st.blocks.sortBy(-_.maxt)
    val maxT = newestFirst.head.maxt
    val byTime =
      if (keepMs <= 0) Set.empty[Long]
      else newestFirst.dropWhile(b => maxT - b.maxt <= keepMs).map(_.blockId).toSet
    val bySize =
      if (maxBytes <= 0) Set.empty[Long]
      else {
        val sizes = newestFirst.scanLeft(0L)(_ + _.bytes).tail
        newestFirst.zip(sizes).dropWhile(_._2 <= maxBytes).map(_._1.blockId).toSet
      }
    val drop = byTime ++ bySize
    if (drop.isEmpty) Nil
    else {
      val (gone, keep) = st.blocks.partition(b => drop.contains(b.blockId))
      Manifest.publish(root, st.copy(blocks = keep))
      gone
    }
  }

  /** Physically delete block dirs no longer referenced by the current
    * manifest (deferred deletion ≙ the reference draining pendingReaders
    * before removing dirs, `db.go:908-940`). */
  def vacuum(): Unit = {
    val live = manifest.blocks.map(_.blockId).toSet
    for (d <- Seq(dataDir, dictDir); f <- Option(new java.io.File(d).listFiles()).getOrElse(Array())) {
      val name = f.getName
      if (name.startsWith("block_id=") &&
        name.stripPrefix("block_id=").toLongOption.exists(!live.contains(_)))
        scala.reflect.io.Directory(f).deleteRecursively()
    }
  }

  /** Consistent snapshot (reference `DB.Snapshot`, `db.go:1108-1146`):
    * copy the live blocks' immutable dirs + a manifest listing exactly
    * them. No Spark job — a filesystem copy, like the reference's
    * hardlink tree. */
  def snapshot(destRoot: String): Unit = {
    val st = manifest
    val destData = Paths.get(destRoot, "data")
    Files.createDirectories(destData)
    def copyTree(src: Path, dst: Path): Unit = {
      val s = Files.walk(src)
      try s.sorted(Comparator.naturalOrder[Path]()).forEach { p =>
        val q = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(q)
        else Files.copy(p, q)
      } finally s.close()
    }
    st.blocks.foreach { b =>
      copyTree(Paths.get(blockPath(b.blockId)),
        destData.resolve(s"block_id=${b.blockId}"))
      val dict = Paths.get(s"$dictDir/block_id=${b.blockId}")
      if (Files.isDirectory(dict))
        copyTree(dict, Paths.get(destRoot, "dict", s"block_id=${b.blockId}"))
    }
    Manifest.publish(destRoot, st)
  }
}

object BlockStore {
  /** Exponential compaction ranges 2h × 3^k (reference
    * `ExponentialBlockRanges`, `compact.go:41-50`; defaults `db.go:51`). */
  def exponentialRanges(minMs: Long, steps: Int, factor: Int = 3): Seq[Long] =
    Compaction.exponentialRanges(minMs, steps, factor)
}

package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.rangeForTimestamp

/** Physical block layout: the reference's immutable block directories
  * (`block.go:266-289`) become time-partitioned parquet, one partition
  * per `t_bucket = rangeForTimestamp(t, blockRangeMs)` (`db.go:1198-1200`;
  * default 2h ranges, `db.go:48-55`). Parquet row groups with min/max
  * stats take the role of chunks (skip-scan), partition pruning takes the
  * role of block selection by `[mint, maxt)`, and a computed meta table
  * replaces `meta.json` (`block.go:152-200`).
  *
  * Layout: `<root>/data/t_bucket=<exclusiveUpperMs>/...parquet`, each
  * partition sorted by (series_key, t) so per-series scans are
  * sequential and row-group stats are tight.
  *
  * Scale notes: writes shuffle once on (t_bucket, series_key-range);
  * `maxRecordsPerFile`-style sizing is left to the writer conf. Reads
  * prune on the t_bucket partition column — a time-range query touches
  * only its blocks, exactly like the reference's
  * `OverlapsClosedInterval` block selection (`block.go:636-641`).
  */
final class BlockStore(val root: String, val blockRangeMs: Long) {
  private def dataDir = s"$root/data"

  /** Persist samples into block partitions (reference `compactor.Write`,
    * `compact.go:524-640`): bucket, sort within partitions, atomic
    * per-partition overwrite. */
  def write(samples: DataFrame, mode: SaveMode = SaveMode.Append): Unit =
    samples
      .withColumn("t_bucket", rangeForTimestamp(col("t"), blockRangeMs))
      .repartition(col("t_bucket"))
      .sortWithinPartitions(col("series_key"), col("t"))
      .write
      .mode(mode)
      .partitionBy("t_bucket")
      .parquet(dataDir)

  /** All samples (partition-pruned on read via `t_bucket`). */
  def read(spark: SparkSession): DataFrame = spark.read.parquet(dataDir)

  /** Samples overlapping the closed range `[mint, maxt]`. `t_bucket` is
    * the block's exclusive upper bound, so the half-open block range
    * `[t_bucket - blockRange, t_bucket)` overlaps iff
    * `t_bucket > mint && t_bucket - blockRange <= maxt` — this predicate
    * is on the partition column and prunes directories, not rows. */
  def readRange(spark: SparkSession, mint: Long, maxt: Long): DataFrame =
    read(spark)
      .where(col("t_bucket") > lit(mint) &&
        col("t_bucket") - lit(blockRangeMs) <= lit(maxt))
      .where(col("t") >= lit(mint) && col("t") <= lit(maxt))

  /** The block meta table (reference `BlockMeta`, `block.go:152-177`):
    * per-block time span + stats (`compact.go:827-831`). */
  def meta(spark: SparkSession): DataFrame =
    read(spark)
      .groupBy("t_bucket")
      .agg(
        min("t").as("mint"),
        max("t").as("maxt"),
        count(lit(1)).as("num_samples"),
        countDistinct("series_key").as("num_series"))
      .orderBy("t_bucket")

  /** Time-based retention (reference `db.go:865-906`): blocks whose
    * whole range is older than `keepMs` behind the newest sample are
    * dropped — returned view; physical deletion = overwrite with it. */
  def afterRetention(spark: SparkSession, keepMs: Long): DataFrame = {
    val df = read(spark)
    val cutoff = df.agg(max("t")).head().getLong(0) - keepMs
    // a block survives iff any of its half-open range is >= cutoff
    df.where(col("t_bucket") > lit(cutoff))
  }

  /** Compaction to coarser blocks (reference leveled compaction,
    * `compact.go:373-464`): re-bucket into `factor ×` wider ranges with
    * vertical dedup (later `block_seq` wins) and tombstone drop — the
    * reference's `populateBlock` as one declarative rewrite. */
  def compacted(
      spark: SparkSession,
      factor: Int,
      tombstones: Option[DataFrame] = None): DataFrame = {
    val withSeq = read(spark).withColumn("block_seq", col("t_bucket"))
    val deduped = Merge.dedupLatest(withSeq).drop("block_seq")
    val cleaned = tombstones.fold(deduped)(t => Tombstones.applyTo(deduped, t))
    cleaned
      .withColumn("t_bucket", rangeForTimestamp(col("t"), blockRangeMs * factor))
  }

  /** Consistent snapshot (reference `DB.Snapshot`, `db.go:1108-1146`):
    * blocks are immutable directories, so a snapshot is a filesystem
    * copy of the partition tree. */
  def snapshot(spark: SparkSession, destRoot: String): Unit =
    read(spark)
      .write.mode(SaveMode.Overwrite).partitionBy("t_bucket")
      .parquet(s"$destRoot/data")
}

object BlockStore {
  /** Exponential compaction ranges 2h × 3^k (reference
    * `ExponentialBlockRanges`, `compact.go:41-50`; defaults `db.go:51`). */
  def exponentialRanges(minMs: Long, steps: Int, factor: Int = 3): Seq[Long] =
    Iterator.iterate(minMs)(_ * factor).take(steps).toSeq
}

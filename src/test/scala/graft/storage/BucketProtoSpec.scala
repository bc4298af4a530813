package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scratch prototype: validate that a bucketed, partitioned catalog
  * table over a block-store layout removes the Exchange before a
  * (series_key, t) dedup aggregate spanning multiple blocks. */
class BucketProtoSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed table scan satisfies the dedup aggregate's distribution") {
    val loc = Files.createTempDirectory("graft-bucket-proto").toString
    val tbl = "graft_proto_tbl"
    spark.sql(s"""
      CREATE TABLE $tbl (
        sample_id BIGINT, series_key STRING, t BIGINT, v DOUBLE,
        block_id BIGINT, t_bucket BIGINT)
      USING PARQUET
      PARTITIONED BY (block_id, t_bucket)
      CLUSTERED BY (series_key) SORTED BY (series_key, t) INTO 8 BUCKETS
      LOCATION '$loc'""")
    try {
      def mk(block: Long, n: Int) =
        (1 to n).map(i => (i.toLong, s"s${i % 50}", i.toLong * 10, i.toDouble))
          .toDF("sample_id", "series_key", "t", "v")
          .withColumn("block_id", lit(block))
          .withColumn("t_bucket", lit(1000L))
      mk(1, 500).write.mode("append").insertInto(tbl)
      mk(2, 500).write.mode("append").insertInto(tbl)

      val read = spark.table(tbl).where(col("block_id").isin(1L, 2L))
      val deduped = Merge.dedupLatest(read, seqCol = "block_id")
      val plan = deduped.queryExecution.executedPlan.toString
      // the aggregate must consume the bucketed scan directly
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("Bucketed: true"), plan.take(3000))
      assert(deduped.count() == 500)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}

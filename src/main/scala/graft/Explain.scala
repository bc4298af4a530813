package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of the named
  * SparkEntry queries (all, if none given) — the `.explain("formatted")`
  * loop used to keep scans pruned (PushedFilters/PartitionFilters),
  * joins broadcast where intended, and WholeStageCodegen spans wide.
  *
  * Usage: `sbt "runMain graft.Explain <sfDir> [name1,name2,...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => names.isEmpty || names.contains(k) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    spark.stop()
  }
}

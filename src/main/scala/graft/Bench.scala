package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: plans execute into the `noop` sink so the *full* plan
  * (including final sorts that a bare `count()` would let Catalyst
  * drop) is measured; a warmup pass at sf0.001 first, so JIT/codegen
  * compilation doesn't land on the first timed query.
  */
object Bench {
  private def runPlan(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)

    // dev aid: SPARK_GRAFT_ONLY=name1,name2 restricts the timed set
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (k, _) => only.forall(_.contains(k)) }

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      selected.foreach { case (_, fn) =>
        try runPlan(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    }

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runPlan(fn(spark, sfDir))
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // BASELINE translation rows: bulk-append throughput into block
    // partitions ("tsdb bench write" analogue) and the partition-merge
    // maintenance job ("BenchmarkCompaction" analogue). Reported as
    // separate fields so the query total stays comparable across rounds.
    val (writeRps, compactSec) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench-").toString
      try {
        val store = new graft.storage.BlockStore(tmp, 6 * 3600 * 1000L)
        val samples = query.TsdbSource.events(spark, sfDir).samples
        val n = samples.count()
        val t0 = System.nanoTime()
        store.write(samples)
        val wSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        store.compact(spark, store.manifest.blocks.map(_.blockId))
        val cSec = (System.nanoTime() - t1) / 1e9
        (n / wSec, cSec)
      } catch {
        case _: Throwable => (0.0, 0.0)
      } finally {
        scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      }
    }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""write_rows_per_sec":$writeRps,"compact_sec":$compactSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}

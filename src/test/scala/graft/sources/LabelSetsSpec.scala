package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite

class LabelSetsSpec extends SparkSuite {

  test("readJson: canonical form, empties dropped, dedup'd (labels/labels.go:191-233)") {
    val f = Files.createTempFile("graft-labelsets", ".json")
    Files.writeString(f,
      """{"b":"2","a":"1"}
        |{"a":"1","b":"2"}
        |{"a":"1","b":"2","empty":""}
        |
        |{"__name__":"up","job":"node"}
        |""".stripMargin)
    val got = LabelSets.readJson(spark, f.toString)
    val keys = got.collect().map(_.getAs[String]("series_key")).sorted.toSeq
    // first three lines are the same canonical set; sorted keys
    assert(keys == Seq("{__name__=\"up\",job=\"node\"}", "{a=\"1\",b=\"2\"}"))
    assert(got.columns.toSeq == Seq("labels", "series_key", "series_hash"))
    assert(got.select("series_hash").distinct().count() == 2)
  }

  test("readJson honors the limit before dedup") {
    val f = Files.createTempFile("graft-labelsets2", ".json")
    Files.writeString(f, (1 to 10).map(i => s"""{"i":"$i"}""").mkString("\n"))
    assert(LabelSets.readJson(spark, f.toString, limit = 3).count() == 3)
  }
}

package graft

import graft.sources.TextFormats

class TextFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl and csv round-trip adversarial strings losslessly") {
    val in = Seq(
      (1L, "he said \"hi\", then left", 10L),
      (2L, "comma, semi; tab\there", 20L),
      (3L, "unicode: café – 日本語", 30L),
      (4L, "", 0L),
      (5L, "  leading and trailing  ", 5L),
      (6L, null, 60L)) // null and "" must round-trip DISTINCT
      .toDF("id", "text", "n")
    def roundTrip(fmt: String): Map[Long, (String, Long)] = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_$fmt").toString + "/d"
      val back = fmt match {
        case "jsonl" =>
          TextFormats.writeJsonl(in, tmp)
          TextFormats.readJsonl(spark, tmp, in.schema)
        case _ =>
          TextFormats.writeCsv(in, tmp)
          TextFormats.readCsv(spark, tmp, in.schema)
      }
      back.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    }
    val expected = in.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(roundTrip("jsonl") == expected)
    val csv = roundTrip("csv")
    assert(csv == expected,
      s"csv corrupted: ${csv.toSeq.diff(expected.toSeq)}")
  }

  test("orc round-trips the same adversarial strings losslessly") {
    val in = Seq(
      (1L, "he said \"hi\", then left", 10L),
      (2L, "comma, semi; tab\there", 20L),
      (3L, "unicode: café – 日本語", 30L),
      (4L, "", 0L),
      (5L, "  leading and trailing  ", 5L),
      (6L, null, 60L))
      .toDF("id", "text", "n")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_orc_spec").toString + "/d"
    TextFormats.writeOrc(in, tmp)
    val back = TextFormats.readOrc(spark, tmp, in.schema).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val expected = in.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(back == expected)
  }
}

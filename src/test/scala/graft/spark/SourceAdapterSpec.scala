package graft.spark

import org.apache.spark.sql.functions._

/** The text source adapters must be IDENTITY on the Turn table: every
  * column byte-equal through the round trip, including the multiline
  * quoted HTML text (the CSV risk) and microsecond timestamps (the
  * default-format risk both writers would silently truncate).
  */
class SourceAdapterSpec extends SparkTestBase {
  import spark.implicits._

  private def turns = Transcripts.derive(spark, "/root/testdata/sf0.001")

  private def asKeyedRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"conv_id", $"turn_idx", $"role", $"text", $"tool",
        unix_micros($"ts").as("ts_us"))
      .as[(String, Int, String, String, String, Long)]
      .collect().toSet

  test("CSV round trip is identity (multiline quoted text, micro ts)") {
    val dir = tmpDir("graft-csv")
    // the derived corpus is single-line HTML, so plant a torture row
    // that exercises the quoting the adapter exists to survive:
    // embedded newlines, double quotes, commas, an empty-vs-null pair
    val microTs = java.sql.Timestamp.valueOf("2023-11-14 22:13:20.123456")
    val torture = Seq(
      ("conv-tt", 0, "user", "line1\nline2 \"quoted\",comma\n<b>x</b>", "",
        microTs),
      ("conv-tt", 1, "tool", "plain", null.asInstanceOf[String], microTs))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val all = turns.unionByName(torture)
    Transcripts.writeCsv(all, s"$dir/in")
    val back = Transcripts.readCsv(spark, s"$dir/in").toDF()
    assert(asKeyedRows(back) == asKeyedRows(all))
    // "" and null both survived distinctly
    val tt = back.filter($"conv_id" === "conv-tt")
      .select($"turn_idx", $"tool").as[(Int, String)].collect().toMap
    assert(tt(0) == "" && tt(1) == null)
  }

  test("audited CSV read surfaces malformed records instead of nulling them") {
    val dir = tmpDir("graft-csv-bad")
    Transcripts.writeCsv(turns.limit(50), s"$dir/in")
    // plant a malformed record file beside the good ones (wrong arity +
    // an unparseable turn_idx — what a broken export actually looks like)
    val bad = new java.io.File(s"$dir/in/zz-bad.csv")
    val w = new java.io.PrintWriter(bad)
    w.println("conv_id,turn_idx,role,text,tool,ts")
    w.println("conv-bad,NOT_AN_INT,user,\"<p>x</p>\",,2023-11-14 22:13:20.000000")
    w.close()
    val audited = Transcripts.readCsvAudited(spark, s"$dir/in")
    // Spark computes corrupt_record lazily per query; pin it so the
    // good/bad split below reads one consistent pass
    val pinned = audited.localCheckpoint()
    val good = pinned.filter($"corrupt_record".isNull)
    val badRows = pinned.filter($"corrupt_record".isNotNull)
    assert(good.count() == 50)
    assert(badRows.count() == 1)
    val rec = badRows.select($"corrupt_record").as[String].head()
    assert(rec.contains("NOT_AN_INT"), s"raw malformed text must survive: $rec")
  }

  test("audited ndjson read surfaces malformed records instead of nulling them") {
    val dir = tmpDir("graft-json-bad")
    Transcripts.writeJson(turns.limit(50), s"$dir/in")
    val bad = new java.io.File(s"$dir/in/zz-bad.json")
    val w = new java.io.PrintWriter(bad)
    w.println("""{"conv_id":"conv-bad","turn_idx":"NOT_AN_INT","role":"user","text":"<p>x</p>""")
    w.close()
    val pinned = Transcripts.readJsonAudited(spark, s"$dir/in").localCheckpoint()
    assert(pinned.filter($"corrupt_record".isNull).count() == 50)
    val badRows = pinned.filter($"corrupt_record".isNotNull)
    assert(badRows.count() == 1)
    assert(badRows.select($"corrupt_record").as[String].head().contains("NOT_AN_INT"))
  }

  test("ndjson round trip is identity and line-splittable") {
    val dir = tmpDir("graft-json")
    Transcripts.writeJson(turns.repartition(4), s"$dir/in")
    val back = Transcripts.readJson(spark, s"$dir/in").toDF()
    assert(asKeyedRows(back) == asKeyedRows(turns))
    // ndjson = one record per physical line (what makes it splittable):
    // no raw newline may survive inside a record
    val files = new java.io.File(s"$dir/in").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }
}

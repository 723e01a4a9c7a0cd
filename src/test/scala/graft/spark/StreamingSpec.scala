package graft.spark

import graft.extract.Extractor
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def turns(offset: Int, n: Int) = (0 until n).map { i =>
    Turn(f"sc-${offset + i}%04d", 0, "user",
      s"<div id='m'>streaming content number ${offset + i} here</div>", "",
      new java.sql.Timestamp(1700000000000L + offset + i))
  }

  test("AvailableNow processes current files, then only increments; per-turn oracle holds") {
    val dir = tmpDir("graft-stream")
    val in = s"$dir/in"
    val out = s"$dir/out"
    new java.io.File(in).mkdirs()

    spark.createDataset(turns(0, 30)).toDF().coalesce(1)
      .write.mode("append").parquet(in)
    val n1 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n1 == 30)

    // rerun with nothing new: no duplicates
    val n2 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n2 == 0)

    // land more files: only the increment processes
    spark.createDataset(turns(100, 20)).toDF().coalesce(1)
      .write.mode("append").parquet(in)
    val n3 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n3 == 20)
    assert(StreamingExtraction.countOutput(spark, out) == 50)

    // per-turn equality vs the pure-function oracle
    val got = StreamingExtraction.readExtracted(spark, out)
      .select("conv_id", "extracted_text").as[(String, String)].collect().toMap
    (turns(0, 30) ++ turns(100, 20)).foreach { t =>
      assert(got(t.conv_id) == Extractor.extract(t.text).text)
    }
  }
}

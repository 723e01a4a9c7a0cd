package graft.spark

import org.apache.spark.sql.functions._

/** Multimodal plumbing: the stub decode is a stand-in, but the batching,
  * shapes, and the resize pixel mapping are real contracts.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    Seq((1L, "some sample document text body for media"),
        (2L, "x"), (3L, "another, rather different, payload")).toDF("doc_id", "text"))

  test("resize: exact nearest-neighbor mapping from the stub-decoded source grid") {
    val rows = Multimodal.resize(media, outW = 4, outH = 3)
      .select(col("doc_id"), col("media"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)].collect().sortBy(_._1)
    val src = media.select(col("doc_id"), col("media"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .as[(Long, Array[Byte], Int, Int)].collect().sortBy(_._1)
    rows.zip(src).foreach { case ((id, out, ow, oh), (_, payload, w, h)) =>
      assert(ow == 4 && oh == 3 && out.length == 12)
      val px = Multimodal.stubDecode(payload, w, h)
      for (yo <- 0 until 3; xo <- 0 until 4) {
        val want = ((px(((yo * h / 3) * w + (xo * w / 4)) % px.length) * 255.0f).toInt & 0xFF).toByte
        assert(out(yo * 4 + xo) == want, s"doc $id pixel ($xo,$yo)")
      }
    }
  }

  test("resize: per-row buffer reuse never aliases output rows") {
    val outs = Multimodal.resize(media, outW = 8, outH = 8)
      .select(col("media")).as[Array[Byte]].collect()
    assert(outs.length == 3)
    // rows come from different payloads — identical arrays would signal
    // the reused buffer escaping without the defensive copy
    assert(outs.map(_.toSeq).distinct.length == 3)
  }

  test("feature extraction: 18 dims, histogram sums to 1") {
    val f = Multimodal.extractFeatures(media)
      .select(col("features")).as[Seq[Float]].collect()
    f.foreach { v =>
      assert(v.length == 18)
      assert(math.abs(v.take(16).sum - 1.0f) < 1e-3)
    }
  }
}

package graft.spark

import org.apache.spark.sql.functions._

/** Integer-quantized LM surprisal scoring: hand-derived model/score
  * fixtures, pre-pruning prefix counts, the planted junk-rejection
  * prediction, no-silent-drop, and partitioning-independence.
  */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hand fixture: model counts, quantized surprisal, OOV penalty, keep filter") {
    val ref = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    // bigrams: (a,b) x3, (b,a) x1, (b,c) x1, (b,x) x1; prefixes a:3 b:3
    val model = LmScore.trainBigramModel(ref, minCount = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(model == Set(("a", "b", 3L, 3L)))
    val scored = LmScore.scoreAgainstModel(
      Seq((10L, "a b a"), (11L, "a b"), (12L, "z")).toDF("doc_id", "text"),
      LmScore.trainBigramModel(ref, minCount = 2))
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc 10: (a,b) hit floor(log2 3)-floor(log2 3)=0 bits, (b,a) OOV 30
    assert(scored(10L) == ((10L, 2L, 1L, 30L, false))) // 3000 > 800*2
    assert(scored(11L) == ((11L, 1L, 0L, 0L, true)))
    // single-word doc: zero bigrams, still present, keep (no evidence)
    assert(scored(12L) == ((12L, 0L, 0L, 0L, true)))
  }

  test("prefix counts are pre-pruning: pruning rare bigrams never inflates p(w2|w1)") {
    // bigrams: (a,b) x2, (a,c), (a,d), (b,a), (c,a), (d,a); prefix a:4.
    // bits for (a,b) = floor(log2 4) - floor(log2 2) = 1; a post-pruning
    // prefix count (2) would give 0 — an inflated probability.
    val ref = Seq((1L, "a b a c a d a b")).toDF("doc_id", "text")
    val m = LmScore.trainBigramModel(ref, minCount = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(m == Set(("a", "b", 2L, 4L)))
    val s = LmScore.scoreAgainstModel(
      Seq((10L, "a b")).toDF("doc_id", "text"),
      LmScore.trainBigramModel(ref, minCount = 2))
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(s == ((10L, 1L, 0L, 1L, true)))
  }

  test("planted junk is rejected, the full natural corpus is scored and present") {
    val d = docs.select($"doc_id", $"text")
    val junkWords = (1 to 6).map(k => md5(concat($"doc_id".cast("string"), lit("#" + k))))
    val junk = docs.select(($"doc_id" + 1000000L).as("doc_id"),
      concat_ws(" ", junkWords: _*).as("text"))
    val model = LmScore.trainBigramModel(docs.filter($"lang" === "en"), minCount = 2)
    val out = LmScore.scoreAgainstModel(d.unionByName(junk), model)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.length == 2 * docs.count())
    val (junkRows, natRows) = out.partition(_._1 >= 1000000L)
    // every junk bigram is OOV by construction -> exactly 30 bits each,
    // keep = false for every junk doc
    junkRows.foreach { case (id, n, oov, bits, keep) =>
      assert(n == 5L && oov == 5L && bits == 150L && !keep, s"junk doc $id")
    }
    // the natural corpus trains the model it is scored against: the en
    // slice must keep essentially everywhere (sanity that the threshold
    // is not vacuous: SOME doc must have a nonzero OOV count)
    assert(natRows.forall(_._5), "a natural doc failed the in-domain filter")
    assert(natRows.exists(_._3 > 0L))
  }

  test("partitioning-independence: same scores under repartition") {
    val model = LmScore.trainBigramModel(docs.filter($"lang" === "en"), minCount = 2)
    val a = LmScore.scoreAgainstModel(docs, model)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val b = LmScore.scoreAgainstModel(docs.repartition(7), model)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(a == b)
  }

  test("null and empty text fold to zero-bigram rows, never dropped") {
    val model = LmScore.trainBigramModel(docs.filter($"lang" === "en"), minCount = 2)
    val out = LmScore.scoreAgainstModel(
      Seq((0L, null: String), (1L, "")).toDF("doc_id", "text"), model)
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 2)
    assert(out(0L)._2 == 0L && out(0L)._5)
    assert(out(1L)._2 == 0L && out(1L)._5)
  }
}

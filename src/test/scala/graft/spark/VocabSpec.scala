package graft.spark

import org.apache.spark.sql.functions._

/** Vocabulary induction + OOV coverage: exact counts, deterministic
  * tie-break, the K cut, zero-token docs restored, and the top-K plan
  * shape (per-partition heaps, not a global vocabulary sort).
  */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(texts: Seq[String]) =
    spark.createDataset(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")

  test("topK: exact counts, ties break to the smaller word, K cuts") {
    // counts: b=4, a=3, c=3, d=1  (a vs c tied at 3 -> a first)
    val docs = mkDocs(Seq("b a c b", "a c b a", "c  b", "d"))
    val top = Vocab.topK(docs, 3).as[(String, Long, Int)].collect().sortBy(_._3)
    assert(top.toSeq == Seq(("b", 4L, 1), ("a", 3L, 2), ("c", 3L, 3)))
    // K larger than the vocabulary: everything ranked, nothing invented
    assert(Vocab.topK(docs, 100).count() == 4)
    // the global order-by-count must plan as a top-K (TakeOrdered),
    // not a full sort of the distinct-word relation
    val plan = Vocab.topK(docs, 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("oovStats: per-doc token/oov counts; zero-token and null docs survive") {
    val docs = mkDocs(Seq("b a c b", "x y b", "", "x x x")).unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(9L, null: String))),
        mkDocs(Seq("z")).schema))
    val vocab = Seq("a", "b", "c").toDF("word")
    val out = Vocab.oovStats(docs, vocab)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 4L, 0L), (1L, 3L, 2L), (2L, 0L, 0L),
      (3L, 3L, 3L), (9L, 0L, 0L)))
  }
}

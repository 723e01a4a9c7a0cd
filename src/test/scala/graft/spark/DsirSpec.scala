package graft.spark

import org.apache.spark.sql.functions._

/** DSIR importance scoring/resampling: hand-derived model and scores
  * on a tiny corpus, the no-silent-drop conventions, fail-loud target
  * predicate, band-rate resampling arithmetic, and the broadcast +
  * single-exchange plan shape.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  // target doc "a a b" features: u:a, u:a, u:b, b:a a, b:a b (5)
  // raw-only doc "c c" features: u:c, u:c, b:c c (3)
  private val corpus = Seq((0L, "en", "a a b"), (1L, "zh", "c c"))

  test("featureModel + score: hand-derived bits, OOV penalty, keep rule") {
    val d = mkDocs(corpus)
    val model = Dsir.featureModel(d, col("lang") === "en")
    // every target-doc bucket has c_target == c_raw -> bits 0; doc1's
    // buckets never appear in the target slice -> excluded from model
    val m = model.as[(String, Long)].collect()
    assert(m.length == 4, m.toSeq.toString) // u:a, u:b, b:a a, b:a b
    assert(m.forall(_._2 == 0L), m.toSeq.toString)
    // doc0: 5 feats x 0 bits; doc1: 3 OOV feats x -20
    val sc = Dsir.score(d, model, oovBits = 20, minCentibits = -300)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(sc.toSeq == Seq((0L, 5L, 0L, true), (1L, 3L, -60L, false)))
  }

  test("score: wordless and null-text docs survive as (0, 0, keep=true)") {
    val d = mkDocs(Seq((0L, "en", "a b"), (1L, "zh", ""))).unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(org.apache.spark.sql.Row(9L, "de", null: String))),
        mkDocs(Seq((0L, "x", "y"))).schema))
    val sc = Dsir.score(d, Dsir.featureModel(d, col("lang") === "en"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(sc.toSeq == Seq((0L, 3L, 0L, true), (1L, 0L, 0L, true),
      (9L, 0L, 0L, true)))
  }

  test("featureModel: null target predicate fails loudly") {
    val d = mkDocs(Seq((0L, null, "a b")))
    val e = intercept[Exception](
      Dsir.featureModel(d, col("lang") === "en").count())
    assert(e.getMessage.contains("isTarget is NULL"), e.getMessage)
  }

  test("resample: full-rate band keeps all, zero floor drops the rest") {
    val d = mkDocs(corpus)
    val scored = Dsir.score(d, Dsir.featureModel(d, col("lang") === "en"))
    // doc0 mean 0 cb >= -1; doc1 mean -2000 cb < -1 -> floor rate 0
    val kept = Dsir.resample(scored, Seq(-1 -> 65536), floorRate = 0)
      .select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(0L))
    // both in the full band -> both kept regardless of the md5 coin
    val all = Dsir.resample(scored, Seq(-10000 -> 65536), floorRate = 0)
    assert(all.count() == 2)
    // descending-threshold contract is enforced
    val e = intercept[IllegalArgumentException](
      Dsir.resample(scored, Seq(-5 -> 100, -1 -> 200), floorRate = 0))
    assert(e.getMessage.contains("descending"), e.getMessage)
  }

  test("plan: model broadcasts; scoring shuffles only (doc_id, longs)") {
    val d = mkDocs(corpus)
    val scored = Dsir.score(d, Dsir.featureModel(d, col("lang") === "en"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly two exchanges: the model's bucket aggregate (bounded at
    // 65536 rows by construction) and the post-join partial aggregate
    // on (doc_id, two longs); raw text never crosses either
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, plan)
  }
}

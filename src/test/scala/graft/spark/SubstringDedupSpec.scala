package graft.spark

import org.apache.spark.sql.functions._

/** Exact-substring (span-level) dedup: hand-derived span/cut fixtures,
  * within-doc duplication and span merging, coverage/length invariants
  * on the natural corpus, partitioning-independence, and the packed-
  * coordinate fail-loud guard.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private val fixture = Seq(
    (0L, "a b c d e f g h"),          // winner copy of the shared 8-gram
    (1L, "a b c d e f g h"),          // full-doc duplicate
    (2L, "x a b c d e f g h y"),      // the gram embedded mid-doc
    (3L, "p q r s t u v w")           // unique — untouched
  ).toDF("doc_id", "text")

  test("hand fixture: winners keep, duplicates cut as exact char spans") {
    val spans = SubstringDedup.duplicateSpans(fixture, n = 8)
      .as[(Long, Long, Long)].collect().toSet
    // winner = (doc 0, pos 0); doc 1 loses its whole text, doc 2 the
    // embedded copy at chars [2, 17)
    assert(spans == Set((1L, 0L, 15L), (2L, 2L, 17L)))
    val out = SubstringDedup.exactSubstringDedup(fixture, n = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, "a b c d e f g h", 0L, 0L)))
    assert(out(1L) == ((1L, "", 1L, 15L)))
    // span covers the gram text exactly — surrounding separators survive
    assert(out(2L) == ((2L, "x  y", 1L, 15L)))
    assert(out(3L) == ((3L, "p q r s t u v w", 0L, 0L)))
  }

  test("within-doc duplication: overlapping removal spans merge into one interior span") {
    val d = Seq((10L, "m n o p q r s t u m n o p q r s t u")).toDF("doc_id", "text")
    // grams at pos 0/1 recur at pos 9/10 (the doubled half); winners are
    // the first-half copies, the two removal spans [18,33) and [20,35)
    // overlap and must merge to [18,35)
    val spans = SubstringDedup.duplicateSpans(d, n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((10L, 18L, 35L)))
    val out = SubstringDedup.exactSubstringDedup(d, n = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert(out == ((10L, "m n o p q r s t u ", 1L, 17L)))
  }

  test("natural corpus invariants: spans sorted, disjoint, in bounds; cut preserves length accounting") {
    val lens = docs.select($"doc_id", length(coalesce($"text", lit(""))).cast("long").as("len"))
      .as[(Long, Long)].collect().toMap
    val spans = SubstringDedup.duplicateSpans(docs, n = 8)
      .as[(Long, Long, Long)].collect()
    assert(spans.nonEmpty) // the ~30-word vocab corpus genuinely has duplicated 8-grams
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, s, e) =>
        assert(s >= 0 && s < e && e <= lens(id), s"span out of bounds for doc $id: [$s,$e)")
      }
      // merged spans are STRICTLY separated (touching spans would have merged)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
    val out = SubstringDedup.exactSubstringDedup(docs, n = 8)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == lens.size)
    out.foreach { case (id, text, nSpans, removed) =>
      assert(text.length.toLong == lens(id) - removed, s"length mismatch for doc $id")
      assert((nSpans == 0) == (removed == 0))
    }
    // the keep-one guarantee, checked directly: after the cut, no 8-gram
    // that was duplicated in the original corpus survives intact twice
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", posexplode(when(size($"ws") >= 8,
        transform(sequence(lit(1), size($"ws") - 7), i =>
          array_join(slice($"ws", i, lit(8)), " ")))
        .otherwise(array().cast("array<string>"))).as(Seq("pos", "g")))
    val dupBefore = grams(docs.select($"doc_id", coalesce($"text", lit("")).as("text")))
      .groupBy($"g").count().filter($"count" >= 2)
      .select($"g").as[String].collect().toSet
    val afterCounts = grams(out.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "text"))
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    dupBefore.foreach { g =>
      val survivors = afterCounts.getOrElse(g, 0L)
      assert(survivors <= 1L, s"duplicated gram survives $survivors times: $g")
    }
  }

  test("partitioning-independence: same spans under repartition") {
    val base = SubstringDedup.duplicateSpans(docs, n = 8)
      .as[(Long, Long, Long)].collect().toSet
    val shuffled = SubstringDedup.duplicateSpans(docs.repartition(7), n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(base == shuffled)
  }

  test("null and short texts: no spans, null folds to empty, doc stays visible") {
    val d = Seq((0L, null: String), (1L, ""), (2L, "too short for grams"))
      .toDF("doc_id", "text")
    assert(SubstringDedup.duplicateSpans(d, n = 8).count() == 0)
    val out = SubstringDedup.exactSubstringDedup(d, n = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 3)
    assert(out(0L)._2 == "" && out(0L)._3 == 0L)
    assert(out(2L)._2 == "too short for grams")
  }

  test("excision: every test-gram occurrence cut everywhere, no keep-one winner") {
    val corpus = Seq(
      (0L, "a b c d e f g h"),          // == the test doc: cut to ''
      (1L, "x a b c d e f g h y"),      // embedded copy: cut, no winner kept
      (2L, "p q r s t u v w")           // disjoint — untouched
    ).toDF("doc_id", "text")
    val tests = Seq((100L, "a b c d e f g h")).toDF("test_id", "text")
    val out = SubstringDedup.excisedCorpus(corpus, tests, n = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // contrast exactSubstringDedup: doc 0 is NOT a winner here — the
    // leaked gram goes everywhere it occurs
    assert(out(0L) == ((0L, "", 1L, 15L)))
    assert(out(1L) == ((1L, "x  y", 1L, 15L)))
    assert(out(2L) == ((2L, "p q r s t u v w", 0L, 0L)))
    // after excision no test gram survives anywhere in the corpus
    val cut = SubstringDedup.excisedCorpus(corpus, tests, n = 8)
    assert(cut.filter(col("text").contains("a b c d e f g h")).count() == 0)
  }

  test("packed coordinate guard fails loudly on a negative doc id") {
    val d = Seq((-1L, "a b c d e f g h"), (1L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      SubstringDedup.duplicateSpans(d, n = 8).collect()
    }
    assert(e.getMessage.contains("out of packable range")
      || Option(e.getCause).exists(_.getMessage.contains("out of packable range")))
  }
}

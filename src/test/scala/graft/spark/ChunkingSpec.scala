package graft.spark

import org.apache.spark.sql.functions._

/** Chunking contract: bounded size, exact overlap, full coverage —
  * concatenating chunks minus their overlaps reconstructs the doc.
  */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(texts: Seq[String]) =
    spark.createDataset(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")

  test("every word covered, chunks bounded, consecutive chunks share exactly `overlap` words") {
    val rnd = new scala.util.Random(5)
    val texts = Seq.tabulate(40)(i =>
      Seq.fill(rnd.nextInt(60) + 1)("w" + rnd.nextInt(1000)).mkString(" ")) ++
      Seq("", "one", "a b c")
    val maxTokens = 8
    val overlap = 3
    val step = maxTokens - overlap
    val out = Chunking.chunk(mkDocs(texts), maxTokens, overlap)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.split(" ", -1)
      val chunks = out(i.toLong)
      // chunk indexes contiguous from 0; sizes bounded; n_tokens true
      assert(chunks.map(_._2).toSeq == chunks.indices)
      chunks.foreach { c =>
        val cw = c._3.split(" ", -1)
        assert(cw.length <= maxTokens && cw.length == c._4, s"doc $i chunk $c")
      }
      // reconstruction: first chunk + each subsequent minus overlap
      val rebuilt = chunks.head._3.split(" ", -1) ++
        chunks.tail.flatMap(_._3.split(" ", -1).drop(overlap))
      assert(rebuilt.toSeq == words.toSeq, s"doc $i")
      // consecutive chunks share exactly `overlap` words
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.split(" ", -1).takeRight(overlap).toSeq ==
            b._3.split(" ", -1).take(overlap).toSeq, s"doc $i overlap")
        case _ =>
      }
      // single-chunk docs iff short enough
      assert((words.length <= maxTokens) == (chunks.length == 1), s"doc $i count")
    }
  }

  test("zero overlap partitions the doc exactly") {
    val out = Chunking.chunk(mkDocs(Seq(((1 to 10).map("t" + _)).mkString(" "))),
        maxTokens = 4, overlap = 0)
      .orderBy("chunk_idx").as[(Long, Int, String, Int)].collect()
    assert(out.map(_._3).toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(out.map(_._4).toSeq == Seq(4, 4, 2))
  }

  test("chunkWithOffsets: chunk_text == substring(text, char_start+1, len) for every chunk") {
    val rnd = new scala.util.Random(11)
    // variable-width words (and embedded non-space whitespace, which
    // split(" ") keeps inside words) so char offsets differ from any
    // token-count arithmetic
    val texts = Seq.tabulate(25)(i =>
      Seq.fill(rnd.nextInt(40) + 1)("x" * (1 + rnd.nextInt(6)) +
        (if (rnd.nextInt(5) == 0) "\nY" else "")).mkString(" ")) ++
      Seq("", "one", "a b c")
    val out = Chunking.chunkWithOffsets(mkDocs(texts), maxTokens = 7, overlap = 2)
      .as[(Long, Int, String, Int, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (d, ci, ct, nt, cs) =>
      val t = texts(d.toInt)
      assert(t.substring(cs.toInt, cs.toInt + ct.length) == ct,
        s"doc $d chunk $ci: offset $cs wrong")
      // the offset is preceded by a space or starts the doc
      assert(cs == 0L || t.charAt(cs.toInt - 1) == ' ', s"doc $d chunk $ci")
      assert(nt == ct.split(" ", -1).length)
    }
    // identical chunking to chunk() itself (offsets are additive only)
    val plain = Chunking.chunk(mkDocs(texts), maxTokens = 7, overlap = 2)
      .as[(Long, Int, String, Int)].collect().toSet
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSet == plain)
  }

  test("chunkWithOffsets stays a shuffle-free projection") {
    val plan = Chunking.chunkWithOffsets(mkDocs(Seq("a b c d e")), 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan)
  }

  test("chunking plans as a shuffle-free projection (no exchange, no UDF)") {
    val plan = Chunking.chunk(mkDocs(Seq("a b c")), 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan)
  }
}

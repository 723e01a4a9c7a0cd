package graft.spark

import org.apache.spark.sql.functions._

/** Next-fit packing contract: equals the sequential reference fold on
  * every shard regardless of Spark partitioning; capacity respected
  * except for observable oversize singletons; every chunk assigned
  * exactly once.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def referenceFold(sizes: Seq[Int], cap: Int): Seq[(Long, Int)] = {
    var seq = 0L; var pos = 0; var fill = 0L
    sizes.zipWithIndex.map { case (nt, i) =>
      if (i == 0) { fill = nt }
      else if (fill + nt > cap) { seq += 1; pos = 0; fill = nt }
      else { pos += 1; fill += nt }
      (seq, pos)
    }
  }

  test("equals the sequential reference fold for random shards and sizes") {
    val rnd = new scala.util.Random(13)
    val cap = 20
    // 30 docs, random chunk counts/sizes (some oversize), hash shards
    val rows = for {
      d <- 0L until 30L
      c <- 0 until (1 + rnd.nextInt(6))
    } yield (d, c, "t", 1 + rnd.nextInt(25))
    val df = spark.createDataset(rnd.shuffle(rows)).toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens")
    val got = Packing.packNextFit(df, cap, nShards = 4)
      .as[(Long, Long, Int, Int, Long, Int)].collect()
    assert(got.length == rows.length) // every chunk exactly once
    val byShard = got.groupBy(_._1)
    byShard.foreach { case (sh, g) =>
      val ordered = g.sortBy(r => (r._2, r._3))
      val want = referenceFold(ordered.map(_._4).toSeq, cap)
      assert(ordered.map(r => (r._5, r._6)).toSeq == want, s"shard $sh")
      // capacity respected except oversize singletons
      ordered.groupBy(_._5).foreach { case (seq, chunks) =>
        val tot = chunks.map(_._4).sum
        assert(tot <= cap || (chunks.length == 1 && chunks.head._4 > cap),
          s"shard $sh seq $seq tot=$tot")
      }
    }
    // shard assignment is the doc hash: a doc's chunks never split
    assert(got.groupBy(_._2).forall(_._2.map(_._1).distinct.length == 1))
  }

  test("sequences materialize every chunk once, in seq_pos order, with true token sums") {
    val docs = spark.createDataset(Seq(
        (1L, (1 to 10).map("a" + _).mkString(" ")),
        (2L, (1 to 3).map("b" + _).mkString(" "))))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, maxTokens = 4, overlap = 0)
    val asg = Packing.packNextFit(chunks, capacity = 6,
      shard = org.apache.spark.sql.functions.col("doc_id"))
    val seqs = Packing.sequences(chunks, asg)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(s => (s._1, s._2))
    // doc 1: chunks (4,4,2) -> next-fit at 6: [4], [4, 2]; doc 2: [3]
    assert(seqs.map(s => (s._1, s._2, s._3, s._4)).toSeq ==
      Seq((1L, 0L, 1L, 4L), (1L, 1L, 2L, 6L), (2L, 0L, 1L, 3L)))
    assert(seqs(1)._5 == "a5 a6 a7 a8\na9 a10") // seq_pos order, EOS separator
    // conservation: every chunk lands in exactly one sequence
    assert(seqs.map(_._3).sum == chunks.count())
    assert(seqs.map(_._4).sum ==
      chunks.agg(sum(col("n_tokens"))).head().getLong(0))
  }

  test("cross-doc packing interleaves docs within a shard; provenance replays membership in order") {
    val docs = spark.createDataset(Seq(
        (1L, (1 to 4).map("a" + _).mkString(" ")),
        (3L, (1 to 4).map("b" + _).mkString(" ")),
        (5L, (1 to 4).map("c" + _).mkString(" "))))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, maxTokens = 4, overlap = 0)
    // all three docs share shard 1 (doc_id % 2); capacity 8 packs TWO
    // docs' chunks into one sequence — a genuine cross-document window
    val asg = Packing.packNextFit(chunks, capacity = 8,
      shard = pmod(col("doc_id"), lit(2)))
    val seqs = Packing.sequences(chunks, asg, withProvenance = true)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .sortBy(s => (s._1, s._2))
    // walk order within shard 1: (1,0), (3,0), (5,0) — 4+4 fills seq 0,
    // doc 5 opens seq 1
    assert(seqs.toSeq == Seq(
      (1L, 0L, 2L, 8L, "a1 a2 a3 a4\nb1 b2 b3 b4", "1:0,3:0"),
      (1L, 1L, 1L, 4L, "c1 c2 c3 c4", "5:0")))
    // provenance fields replay exactly the member (doc, chunk) keys in
    // seq_pos order — a takedown of doc 3 locates sequence (1, 0) alone
    assert(seqs.count(_._6.split(",").exists(_.startsWith("3:"))) == 1)
    // the traceback operators agree with the provenance column
    val byPred = Packing.affectedSequences(asg, col("doc_id") === 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(byPred == Seq((1L, 0L, "3")))
    val byDocs = Packing.affectedSequencesByDocs(asg,
      spark.createDataset(Seq(3L, 5L)).toDF("doc_id"))
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(byDocs == Seq((1L, 0L, "3"), (1L, 1L, "5")))
  }

  test("plans as ONE exchange (shard repartition) + in-partition sort") {
    val df = spark.createDataset(Seq((1L, 0, "t", 3))).toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens")
    val plan = Packing.packNextFit(df, 10).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused")) == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan) // no global sort
  }
}

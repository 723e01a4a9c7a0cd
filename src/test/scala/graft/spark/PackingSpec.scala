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

  test("plans as ONE exchange (shard repartition) + in-partition sort") {
    val df = spark.createDataset(Seq((1L, 0, "t", 3))).toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens")
    val plan = Packing.packNextFit(df, 10).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused")) == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan) // no global sort
  }
}

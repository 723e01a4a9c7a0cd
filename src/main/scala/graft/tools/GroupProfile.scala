package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Dedup

/** Stage attribution for the q_dedup_corpus composition — which subtree
  * owns the wall-clock at a given SF (exact tier, LSH candidates,
  * trigram verify, connected components, final anti-join).
  */
object GroupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // replicate SparkEntry.chainBase + q_dedup_corpus universe
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val tag = concat(col("doc_id").cast("long").cast("string"), lit(":"), col("text"))
    val words = (1 to 16).map(k => md5(concat(tag, lit("#" + k))))
    val base = docs0.select(col("doc_id"), concat_ws(" ", words: _*).as("text"))
    val chained = Dedup.withPerturbedChain(base)
    val withExact = chained.unionByName(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(3000000L)).as("doc_id"), col("text")))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("universe materialize")(println("  n=" + withExact.count()))
      val ids = withExact.select(col("doc_id"), md5(col("text")).as("h"))
      val keep = ids.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
      time("exact tier")(println("  exact_groups=" + keep.count()))
      val cand = Dedup.nearDupPairs(withExact, simThreshold = 0.5)
        .select(col("a"), col("b"))
      time("LSH candidates")(println("  cand=" + cand.count()))
      val verified = Dedup.ngramJaccardPairs(withExact, cand, 0.5)
        .select(col("a"), col("b"))
      time("trigram verify")(println("  verified=" + verified.count()))
      val edges = verified.localCheckpoint()
      time("edges checkpoint reuse")(println("  edges=" + edges.count()))
      val cc = Dedup.connectedComponents(edges, iters = 8)
      time("CC 8 iters")(println("  labeled=" + cc.count()))
      val cc2 = Dedup.connectedComponents(edges, iters = 2)
      time("CC 2 iters")(println("  labeled=" + cc2.count()))
      val full = Dedup.dedupedCorpus(withExact, simThreshold = 0.5)
      time("full dedupedCorpus")(println("  kept=" + full.count()))
      // the BENCH shape: noop-write of every output column (count()
      // prunes the text synthesis away; the bench cannot)
      val q = Dedup.dedupedCorpus(withExact, simThreshold = 0.5)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      time("bench shape (noop write)")(graft.Bench.runQuery(q))
      // same, but with the synthesized universe pinned first — is the
      // 4x re-synthesis of the planted texts the gap?
      val pinned = withExact.localCheckpoint()
      val qp = Dedup.dedupedCorpus(pinned, simThreshold = 0.5)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      time("bench shape, pinned universe")(graft.Bench.runQuery(qp))
    }
    // BUILD (dedupedCorpus runs the LSH -> verify -> CC actions eagerly
    // through connectedComponentsConverged's checkpoints + convergence
    // counts) vs RUN (the final anti-join + output materialization),
    // with and without pinning the synthesized universe. This split is
    // what located the round-5 fix: a count()-timed "fast path" was a
    // measurement artifact (the df had been BUILT outside the timer and
    // count() pruned the text synthesis), the real cost sat in BUILD,
    // and the per-subtree re-synthesis of the planted texts was ~40% of
    // the total — pinned: 6.6 -> 4.0 s wall at sf0.1 (q_dedup_corpus
    // bench reps 7.0 -> 4.4 s).
    for (rep <- 1 to 2) {
      val qa = time(s"unpinned BUILD rep$rep")(
        Dedup.dedupedCorpus(withExact, simThreshold = 0.5)
          .select(col("doc_id").cast("long").as("doc_id"), col("text")))
      time(s"unpinned RUN rep$rep")(graft.Bench.runQuery(qa))
      val qc = time(s"pinned BUILD rep$rep") {
        val pin = withExact.localCheckpoint()
        Dedup.dedupedCorpus(pin, simThreshold = 0.5)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      }
      time(s"pinned RUN rep$rep")(graft.Bench.runQuery(qc))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Headline benchmark. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "turns":N,"turns_per_sec":N,"cpus":N, ...}
  *
  * Self-explaining protocol (VERDICT r1 item 3 — the driver's single run
  * must be interpretable on a box that stalls for tens of seconds at
  * random):
  *  - the transcripts input is derived ONCE and materialized to parquet;
  *    every query then reads that stable file-backed table (primeCache),
  *    so no measured time can silently include re-derivation or
  *    block-manager cache eviction;
  *  - each query runs `reps` replicates; ALL raw times are printed
  *    (`queries_all`), the headline per-query number is the minimum
  *    (uncontended estimate) and `queries_median` is also emitted;
  *  - before each replicate a fixed single-thread CPU probe is timed
  *    (`calib_ms_*`): if the probe swings, the box — not the engine —
  *    was loaded during that window;
  *  - the timed phase opens with a bounded quiet-window gate and each
  *    query earns salvage reps if every scheduled rep was contended
  *    (steal/page-fault storms — see awaitQuietWindow), so the single
  *    unattended run records the engine, not the hypervisor's mood;
  *    `quiet_wait_sec`/`launch_steal_pct` report what the gate did;
  *  - a rep that THROWS is marked failed and excluded from every
  *    min/median/total (a failure's wall time is time-to-failure, not
  *    engine speed); all-reps-failed queries land in `failed_queries`.
  *
  * Queries are forced through the `noop` sink — a bare count() would let
  * Catalyst prune the (deterministic) parse UDF columns and measure only
  * the scan.
  */
object Bench {
  def runQuery(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Fixed single-thread CPU probe (~40ms uncontended): detects external
    * load/stalls independent of Spark.
    */
  def calibrate(): Double = {
    val t0 = System.nanoTime()
    var acc = 0L
    var i = 0
    while (i < 20000000) { acc ^= graft.text.Fingerprints.mix64(i); i += 1 }
    if (acc == 42) println("") // keep the loop alive
    (System.nanoTime() - t0) / 1e6
  }

  /** (steal, idle+iowait, system, total) jiffies from /proc/stat —
    * hypervisor steal is the signature of the VM being throttled while
    * its own single-thread probes stay fast; SYSTEM time is the
    * signature of kernel memory-reclaim stalls (tmpfs pressure against a
    * huge JVM heap), which steal% and gc% are both blind to.
    */
  def cpuStat(): (Long, Long, Long, Long) =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.split("\\s+").drop(1).map(_.toLong)
      val steal = if (f.length > 7) f(7) else 0L
      (steal, f(3) + (if (f.length > 4) f(4) else 0L), f(2), f.sum)
    } catch { case _: Throwable => (0L, 0L, 0L, 1L) }

  /** Free bytes on the filesystem holding the shuffle dirs (tmpfs =
    * RAM): accumulation here IS memory pressure on a no-swap box.
    */
  def shmFreeGib(dir: String): Double =
    try {
      val s = java.nio.file.Files.getFileStore(java.nio.file.Paths.get(dir))
      s.getUsableSpace / 1073741824.0
    } catch { case _: Throwable => -1.0 }

  /** Sample hypervisor-steal percentage over a short wall-clock window. */
  def sampleStealPct(windowMs: Long): Double = {
    val (st0, _, _, tot0) = cpuStat()
    Thread.sleep(windowMs)
    val (st1, _, _, tot1) = cpuStat()
    if (tot1 > tot0) 100.0 * (st1 - st0) / (tot1 - tot0) else 0.0
  }

  /** Bounded quiet-window gate (VERDICT r4 nit 1): the box flips between
    * 0% and 5-15% hypervisor steal within minutes, and a full-set run
    * launched into a dirty window under-records the engine severalfold
    * even though every per-rep diagnostic says why. Rather than hoping
    * the (single, unattended) driver run lands well, delay the timed
    * phase until a 2-second steal probe reads < `maxStealPct`, waiting at
    * most `maxWaitSec` — if the box never goes quiet, proceed anyway (the
    * per-rep steal/sys arrays still attribute the damage). Returns
    * (seconds waited, steal% at launch) for the output JSON.
    */
  def awaitQuietWindow(maxWaitSec: Int, maxStealPct: Double): (Double, Double) = {
    val t0 = System.nanoTime()
    var steal = sampleStealPct(2000)
    while (steal >= maxStealPct && (System.nanoTime() - t0) / 1e9 < maxWaitSec) {
      Thread.sleep(3000)
      steal = sampleStealPct(2000)
    }
    ((System.nanoTime() - t0) / 1e9, steal)
  }

  /** Resident set of this (driver==executor in local mode) JVM in GiB. */
  def rssGib: Double =
    try {
      scala.io.Source.fromFile("/proc/self/status").getLines()
        .find(_.startsWith("VmRSS:"))
        .map(_.split("\\s+")(1).toLong / 1048576.0).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  /** The headline subset (scan+parse heavy / shuffle heavy / join heavy).
    * Round 3 appended the skew-safe sessionizer and the HLL sketch;
    * round 4 appended the contamination fingerprint join, the
    * char-budgeted conversation cap, training-sequence chunking,
    * next-fit packing, and the end-to-end training composition; round 5
    * appends the end-to-end corpus dedup (exact tier + LSH -> verify ->
    * components -> survivor), partial-inclusion contamination, and the
    * end-to-end curation composition (redact -> Gopher filter -> dedup
    * -> sample -> budget -> split), corpus-wide paragraph-level dedup,
    * the deterministic training-order materialization, the fully-ordered
    * packed-shard artifact, cross-document packing provenance, training
    * loss-mask spans, packed sample-boundary spans, and the loss mask
    * carried end-to-end into packed coordinates, exact-substring span
    * dedup, integer-quantized LM surprisal scoring, and the v2
    * curation composition (all eight stages), then (round-5 tail) DSIR
    * importance scoring, BPE-weighted packing, and the DSIR -> chunk ->
    * BPE-count -> pack composition — per-query numbers stay comparable
    * across rounds; the `total` line covers 45 queries from the round-5
    * tail on (42 earlier in round 5, 23 in round 4, 18 in round 3, 16
    * before).
    */
  val headline: Seq[String] = Seq(
    "q_pipeline_extract", "q_pipeline_onepass", "q_pipeline_extractfirst",
    "q_roundtrip", "q_find_links", "q_extract_main",
    "q_conversations", "q_get_content", "q_dedup_exact", "q_ngram_jaccard",
    "q_neardup_pairs", "q_embed_topk", "q_embed_ivf", "q_gen_nodes",
    "q_media_features", "q_token_count", "q_sessionize_skewsafe",
    "q_sketch_users", "q_contamination", "q_conversations_bytecapped",
    "q_chunked", "q_packed", "q_training_pipeline",
    "q_dedup_corpus", "q_contamination_partial", "q_curation_pipeline",
    "q_paragraph_dedup", "q_training_order", "q_ordered_shards",
    "q_packed_provenance", "q_loss_mask", "q_packed_spans",
    "q_masked_pipeline", "q_substr_dedup", "q_lm_score",
    "q_curation_pipeline_v2", "q_ngram_decontaminated", "q_semantic_dedup",
    "q_excised", "q_line_clean", "q_dedup_corpus_best", "q_line_pipeline",
    "q_dsir", "q_packed_bpe", "q_dsir_pipeline")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nTurns = spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // materialize the transcripts table once; queries read the stable copy
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-bench").toString
    graft.spark.Transcripts.deriveUncached(spark, sfDir)
      .write.mode("overwrite").parquet(s"$work/transcripts")
    val stable = spark.read.parquet(s"$work/transcripts")
    graft.spark.Transcripts.primeCache(spark, sfDir, stable)

    // Bounded heap-ballast warmup (VERDICT r3 item 6) — MEASURED AND
    // REJECTED as a default, kept env-gated for re-testing: the idea was
    // to pre-fault the working set untimed on windows where the
    // hypervisor serves first-touch page faults slowly. Measured round 4
    // (16 GiB ballast, 90g heap, slow-fault window): the touch cost
    // 106.8 s and RSS collapsed 19.4 -> ~10 GiB before the first timed
    // rep — ParallelGC's adaptive shrink RETURNS the pre-faulted pages
    // to the OS, so the timed reps re-fault them anyway. A live ballast
    // would pin the pages but steal them from Spark; -Xms doesn't help
    // (reservation is not touch). Full arrays in BENCH/BASELINE.md.
    sys.env.get("SPARK_GRAFT_BENCH_BALLAST").filter(_.nonEmpty)
      .map(_.toInt).filter(_ > 0).foreach { gib =>
      val t0 = System.nanoTime()
      val nChunks = gib * 1024 // 1 MiB chunks; new Array zeroes => touches every page
      var keep = new Array[Array[Byte]](nChunks)
      var i = 0
      while (i < nChunks) { keep(i) = new Array[Byte](1 << 20); i += 1 }
      val touched = keep.length // keep the reference live until here
      keep = null
      println(f"[bench] ballast ${touched / 1024} GiB touched in ${(System.nanoTime() - t0) / 1e9}%.1f s, rss=${rssGib}%.1f GiB")
    }

    // JIT warmup: drive the parser/extractor hot paths on a ~5% sample so
    // the first timed query doesn't absorb compilation cost. (limit()
    // would funnel through one task; a hash filter stays parallel.)
    locally {
      import org.apache.spark.sql.functions._
      val t = stable
        .filter(pmod(hash(col("conv_id")), lit(20)) === 0)
        .select(col("conv_id"), col("turn_idx"), col("text"))
      runQuery(t.select(graft.spark.HtmlFunctions.to_html(col("text"))))
      runQuery(graft.spark.Pipeline.extractTurns(t).toDF())
    }

    // optional comma-separated subset for targeted re-measurement —
    // names outside the headline select from the full SparkEntry map
    // (ad-hoc profiling of any driver query)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val selected = only.fold(headline) { f =>
      headline.filter(f) ++
        SparkEntry.queries.keys.filter(n => f(n) && !headline.contains(n)).toSeq.sorted
    }
    final case class Rep(sec: Double, calMs: Double, stealPct: Double, gcPct: Double,
                         sysPct: Double, shmFree: Double, heapUsed: Double, rss: Double,
                         failed: Boolean)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val localDir = spark.conf.get("spark.local.dir")

    // don't start the timed phase inside a dirty window (bounded wait;
    // knobs: SPARK_GRAFT_BENCH_QUIET_WAIT seconds, 0 disables)
    val quietWait = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT", "120").toInt
    val (waitedSec, launchSteal) =
      if (quietWait > 0) awaitQuietWindow(quietWait, maxStealPct = 1.0)
      else (0.0, sampleStealPct(1000))

    def runRep(name: String, fn: (SparkSession, String) => DataFrame): Rep = {
      val cal = calibrate()
      val (st0, _, sys0, tot0) = cpuStat()
      val gc0 = gcMs
      val t0 = System.nanoTime()
      // a rep that THROWS must never be recorded as a measurement: the
      // round-5 draft table briefly carried a 0.32 s "record" for a
      // query whose require failed at that SF — time-to-failure, not
      // engine speed. Mark it and exclude it from min/median/total.
      val failed =
        try { runQuery(fn(spark, sfDir)); false }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e"); true }
      val sec = (System.nanoTime() - t0) / 1e9
      val (st1, _, sys1, tot1) = cpuStat()
      val stealPct =
        if (tot1 > tot0) 100.0 * (st1 - st0) / (tot1 - tot0) else 0.0
      // attributable explanations for a slow replicate: hypervisor
      // steal, driver-JVM GC, kernel (memory-reclaim) system time,
      // and the memory state itself (tmpfs free / heap / RSS)
      val sysPct =
        if (tot1 > tot0) 100.0 * (sys1 - sys0) / (tot1 - tot0) else 0.0
      val gcPct = if (sec > 0) (gcMs - gc0) / 10.0 / sec else 0.0
      val heapUsed = (Runtime.getRuntime.totalMemory() -
        Runtime.getRuntime.freeMemory()) / 1073741824.0
      Rep(sec, cal, stealPct, gcPct, sysPct, shmFreeGib(localDir), heapUsed, rssGib,
        failed)
    }
    // a rep launched into external interference: hypervisor steal, or a
    // kernel page-fault/reclaim storm (the two failure signatures that
    // dirtied the round-4 driver record)
    def contended(r: Rep): Boolean = r.stealPct > 1.0 || r.sysPct > 15.0
    // shared wall-clock budget for pre-salvage quiet waits across ALL
    // queries (the launch gate only covers the start of the run; the box
    // flips windows within minutes, so mid-run queries need their own —
    // bounded — chance to wait the storm out)
    var salvageWaitBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SALVAGE_WAIT", "120").toDouble
    val results: Seq[(String, Seq[Rep])] =
      selected.flatMap { name =>
        SparkEntry.queries.get(name).map { fn =>
          var times = (0 until reps).map(_ => runRep(name, fn))
          // salvage: the headline is min-of-reps, so a query is only
          // misrecorded when EVERY rep was contended — grant up to 2
          // extra reps in that case, each preceded by a short quiet wait
          // while the shared budget lasts (bounded extra cost, and the
          // raw arrays keep the full history honest)
          var extra = 0
          // (failed reps are deterministic bugs, not weather — never
          // salvage them)
          while (extra < 2 && times.forall(r => contended(r) && !r.failed)) {
            if (salvageWaitBudget > 0) {
              val (w, _) = awaitQuietWindow(
                math.min(salvageWaitBudget, 45.0).toInt, maxStealPct = 1.0)
              salvageWaitBudget -= w
            }
            times = times :+ runRep(name, fn)
            extra += 1
          }
          (name, times)
        }
      }

    def jnum(v: Double): String = f"$v%.3f"
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def obj(f: (String, Seq[Rep]) => String): String =
      results.map { case (k, rs) => "\"" + k + "\":" + f(k, rs) }.mkString("{", ",", "}")
    // headline statistics are over SUCCESSFUL reps only; a query whose
    // every rep failed reports null and lands in failed_queries — loud,
    // not fast
    def okSecs(rs: Seq[Rep]): Seq[Double] = rs.filterNot(_.failed).map(_.sec)
    val qMin = obj((_, rs) =>
      { val ok = okSecs(rs); if (ok.isEmpty) "null" else jnum(ok.min) })
    val qMed = obj((_, rs) =>
      { val ok = okSecs(rs); if (ok.isEmpty) "null" else jnum(median(ok)) })
    val qFailed = obj((_, rs) => rs.map(_.failed.toString).mkString("[", ",", "]"))
    val failedQueries = results.collect {
      case (k, rs) if rs.forall(_.failed) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val qAll = obj((_, rs) => rs.map(r => jnum(r.sec)).mkString("[", ",", "]"))
    val cAll = obj((_, rs) => rs.map(r => f"${r.calMs}%.0f").mkString("[", ",", "]"))
    val sAll = obj((_, rs) => rs.map(r => f"${r.stealPct}%.1f").mkString("[", ",", "]"))
    val gAll = obj((_, rs) => rs.map(r => f"${r.gcPct}%.1f").mkString("[", ",", "]"))
    val syAll = obj((_, rs) => rs.map(r => f"${r.sysPct}%.1f").mkString("[", ",", "]"))
    val shmAll = obj((_, rs) => rs.map(r => f"${r.shmFree}%.1f").mkString("[", ",", "]"))
    val heapAll = obj((_, rs) => rs.map(r => f"${r.heapUsed}%.1f").mkString("[", ",", "]"))
    val rssAll = obj((_, rs) => rs.map(r => f"${r.rss}%.1f").mkString("[", ",", "]"))
    val totalMin = results.flatMap(t => okSecs(t._2).minOption).sum
    val totalMed = results.map(t => okSecs(t._2))
      .collect { case ok if ok.nonEmpty => median(ok) }.sum
    def minOk(name: String): Double = results.find(_._1 == name)
      .flatMap(t => okSecs(t._2).minOption).getOrElse(Double.NaN)
    val pipeSec = minOk("q_pipeline_extract")
    val onePassSec = minOk("q_pipeline_onepass")
    val exFirstSec = minOk("q_pipeline_extractfirst")
    val tps = if (pipeSec > 0) nTurns / pipeSec else 0.0
    val tps1 = if (onePassSec > 0) nTurns / onePassSec else 0.0
    val tpsEf = if (exFirstSec > 0) nTurns / exFirstSec else 0.0
    val heapG = Runtime.getRuntime.maxMemory() / (1 << 30)
    println(s"""{"metric":"total","value":${jnum(totalMin)},"unit":"sec","queries":$qMin,"queries_median":$qMed,"total_median":${jnum(totalMed)},"reps":$reps,"queries_all_sec":$qAll,"calib_ms":$cAll,"steal_pct":$sAll,"gc_pct":$gAll,"sys_pct":$syAll,"shm_free_gib":$shmAll,"heap_used_gib":$heapAll,"rss_gib":$rssAll,"input":"materialized-parquet","sf":"$sfDir","turns":$nTurns,"turns_per_sec":${f"$tps%.1f"},"turns_per_sec_onepass":${f"$tps1%.1f"},"turns_per_sec_extractfirst":${f"$tpsEf%.1f"},"cpus":$cpus,"heap_gib":$heapG,"quiet_wait_sec":${f"$waitedSec%.1f"},"launch_steal_pct":${f"$launchSteal%.1f"},"failed_reps":$qFailed,"failed_queries":$failedQueries}""")
    spark.stop()
    // free the /dev/shm staging copy (RAM-backed — must not accumulate)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(work)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}

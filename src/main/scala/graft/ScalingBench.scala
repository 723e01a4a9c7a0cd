package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{Pipeline, Transcripts}

/** Two-parallelism scaling evidence (BASELINE.json: throughput@4N /
  * (4 x throughput@N) >= 0.8 between N and 4N executors).
  *
  * Mode `cluster` (default when SPARK_HOME + the packaged jar exist):
  * `local-cluster[N,coresPerExec,mem]` — N *separate executor JVMs* on
  * this box, each with its own heap/GC, shuffling over netty. This is the
  * closest single-machine proxy for an N-executor cluster; run `sbt
  * package` first so executors can load the engine classes.
  * Mode `threads`: plain local[N] vs local[4N] (shared-JVM fallback).
  *
  * Protocol: materialize the transcripts input once (replicated so the
  * parallel fraction dominates fixed job overhead), fresh SparkSession
  * per level, one full untimed warmup pass per level, min of repeated
  * timed runs per level. Prints one JSON line.
  */
object ScalingBench {
  /** Cores per executor JVM (SPARK_GRAFT_SCALE_CORES, default 4).
    * 1-core executors keep BOTH levels' aggregate throughput under this
    * VM's ~400k turns/s memory-bandwidth/CPU-cap ceiling (the controls in
    * BENCH/BASELINE.md isolate it; even a bare parquet scan caps), so the
    * measured ratio reflects the ENGINE's plan scaling, not the host
    * wall. spark.executor.cores=1 is a standard cluster shape.
    */
  private val CoresPerExec =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES", "4").toInt

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // N=1 => 4 vs 16 executor cores: the 4N level still leaves half the
    // 32-CPU host idle, so the comparison measures the ENGINE's scaling,
    // not the host's memory-bandwidth ceiling (r1 ran 8 vs 32 cores and
    // measured the saturated host)
    val nExec = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "8").toInt
    val jar = findJar()
    val mode =
      sys.env.getOrElse("SPARK_GRAFT_MODE",
        if (jar.isDefined && sys.env.contains("SPARK_HOME")) "cluster" else "threads")
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-scale").toString

    // 1) materialize the input once (local mode — this is setup, not the
    // measured job)
    locally {
      import org.apache.spark.sql.functions._
      val s = session("local[32]", 32, None)
      // heavy mode multiplies the PROSE block — which DILUTES parse CPU
      // per shuffled byte (text parses ~2x faster per byte than tag soup)
      // and drives the job toward the single-box bandwidth wall. The
      // tag-dense 850 B template (heavy=1) is the highest-CPU-per-byte
      // regime and the honest default; heavy>1 is the padded-prose
      // control (measured: 0.36 efficiency vs 0.82 at heavy=1).
      val heavy = sys.env.getOrElse("SPARK_GRAFT_SCALE_HEAVY", "1").toInt
      val t0 = Transcripts.derive(s, sfDir)
      val pad = s"<section><h2>pad heading</h2><p>${"pad word block " * 16}</p></section>"
      val t = if (heavy <= 1) t0
        else t0.withColumn("text",
          regexp_replace(col("text"), "</body>", (pad * heavy) + "</body>"))
      t.withColumn("rep", explode(array((0 until repl).map(lit): _*)))
        .withColumn("conv_id", concat(col("conv_id"), lit("-r"), col("rep")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$work/transcripts")
      s.stop()
    }

    def masterFor(execs: Int): (String, Int) = mode match {
      case "cluster" =>
        (s"local-cluster[$execs,$CoresPerExec,6144]", execs * CoresPerExec)
      // mode "external": a running standalone master whose workers are
      // taskset-pinned to disjoint core sets (scripts/standalone_cluster.sh)
      // — spark.cores.max selects how many pinned 4-core workers the level
      // uses; an N=1 run physically cannot borrow the other cores
      case "external" =>
        (sys.env.getOrElse("SPARK_GRAFT_MASTER_URL", "spark://127.0.0.1:7077"),
          execs * CoresPerExec)
      case _ => (s"local[${execs * CoresPerExec}]", execs * CoresPerExec)
    }

    var cnt = 0L
    /** One session per rep; times three jobs over the same input:
      *   full  — the north_rule pipeline (salt shuffle -> extract ->
      *           reassembly shuffle), the headline number;
      *   extract — scan + mapPartitions extraction only (no exchange):
      *           isolates the COMPUTE fraction;
      *   scan  — parquet scan + projection only: isolates input I/O.
      * The three efficiencies attribute any scaling residual to a stage.
      */
    def timed(execs: Int): (Double, Double, Double, Double) = {
      import org.apache.spark.sql.functions.{col, length, sum}
      val (master, cores) = masterFor(execs)
      val s = session(master, cores,
        if (mode == "cluster" || mode == "external") jar else None)
      import s.implicits._
      val turns = s.read.parquet(s"$work/transcripts")
      // north-rule shape: salted (explicit skew-defeating repartition,
      // default) or extractfirst (extraction on scan partitions, one
      // exchange of extracted text — the recommended production shape)
      val shape = sys.env.getOrElse("SPARK_GRAFT_SCALE_SHAPE", "salted")
      def fullJob(): Unit =
        Bench.runQuery(
          (if (shape == "extractfirst") Pipeline.extractReassembledExtractFirst(turns)
           else Pipeline.reassembled(Pipeline.extractTurns(turns))).toDF())
      def extractJob(): Unit =
        Bench.runQuery(turns.select(col("conv_id"), col("turn_idx"), col("text"))
          .as[(String, Int, String)]
          .mapPartitions(_.map { case (c, i, t) =>
            val r = graft.extract.Extractor.extract(if (t == null) "" else t)
            (c, i, r.text, r.nNodes, r.nErrors)
          }).toDF())
      def scanJob(): Unit =
        Bench.runQuery(turns.select(sum(length(col("text")))))
      // breakdown jobs triple the wall-clock per rep — skippable when only
      // the headline efficiency is being measured (narrower noise window)
      val breakdown = sys.env.getOrElse("SPARK_GRAFT_SCALE_BREAKDOWN", "1") == "1"
      fullJob() // warmup (JIT + codegen)
      if (breakdown) { extractJob(); scanJob() }
      cnt = turns.count()
      def clock(f: () => Unit): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      val (st0, _, _, tot0) = Bench.cpuStat()
      val full = clock(fullJob)
      val (st1, _, _, tot1) = Bench.cpuStat()
      val extract = if (breakdown) clock(extractJob) else Double.NaN
      val scan = if (breakdown) clock(scanJob) else Double.NaN
      val steal = if (tot1 > tot0) 100.0 * (st1 - st0) / (tot1 - tot0) else 0.0
      s.stop()
      (full, extract, scan, steal)
    }

    // interleave levels A/B/A/B/A/B so background-load drift hits both
    // symmetrically; median per level
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
    import scala.collection.mutable.ArrayBuffer
    val fullN = ArrayBuffer[Double](); val full4 = ArrayBuffer[Double]()
    val extN = ArrayBuffer[Double](); val ext4 = ArrayBuffer[Double]()
    val scanN = ArrayBuffer[Double](); val scan4 = ArrayBuffer[Double]()
    val stealN = ArrayBuffer[Double](); val steal4 = ArrayBuffer[Double]()
    (0 until reps).foreach { _ =>
      val (fN, eN, sN, stN) = timed(nExec)
      fullN += fN; extN += eN; scanN += sN; stealN += stN
      val (f4, e4, s4, st4) = timed(4 * nExec)
      full4 += f4; ext4 += e4; scan4 += s4; steal4 += st4
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // median = typical on this noisy box; min = uncontended estimate (the
    // box stalls for tens of seconds at random — raw replicates printed)
    def eff(a: Seq[Double], b: Seq[Double], f: Seq[Double] => Double): Double =
      (cnt / f(b)) / (4.0 * (cnt / f(a)))
    val secN = median(fullN.toSeq); val sec4N = median(full4.toSeq)
    val thrN = cnt / secN; val thr4N = cnt / sec4N
    val effFull = eff(fullN.toSeq, full4.toSeq, median)
    val effFullMin = eff(fullN.toSeq, full4.toSeq, _.min)
    val effExt = eff(extN.toSeq, ext4.toSeq, median)
    val effExtMin = eff(extN.toSeq, ext4.toSeq, _.min)
    val effScan = eff(scanN.toSeq, scan4.toSeq, median)
    def arr(xs: Seq[Double], fmt: String = "%.2f") =
      xs.map(t => fmt.format(t)).mkString("[", ",", "]")
    println(f"""{"metric":"scaling_efficiency","value":$effFull%.3f,"value_min_based":$effFullMin%.3f,"eff_extract_only":$effExt%.3f,"eff_extract_only_min":$effExtMin%.3f,"eff_scan_only":$effScan%.3f,"mode":"$mode","n_executors":$nExec,"n4_executors":${4 * nExec},"cores_per_executor":$CoresPerExec,"turns":$cnt,"sec_n":$secN%.2f,"sec_4n":$sec4N%.2f,"turns_per_sec_n":$thrN%.1f,"turns_per_sec_4n":$thr4N%.1f,"all_sec_n":${arr(fullN.toSeq)},"all_sec_4n":${arr(full4.toSeq)},"extract_sec_n":${arr(extN.toSeq)},"extract_sec_4n":${arr(ext4.toSeq)},"scan_sec_n":${arr(scanN.toSeq)},"scan_sec_4n":${arr(scan4.toSeq)},"steal_pct_n":${arr(stealN.toSeq, "%.1f")},"steal_pct_4n":${arr(steal4.toSeq, "%.1f")},"sf":"$sfDir"}""")
    // free the /dev/shm staging copy (RAM-backed — must not accumulate)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(work)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  private def findJar(): Option[String] = {
    val dir = new java.io.File("target/scala-2.13")
    if (!dir.exists) return None
    dir.listFiles.filter(f => f.getName.startsWith("dhtmlparserspark") &&
      f.getName.endsWith(".jar")).sortBy(_.getName).lastOption.map(_.getAbsolutePath)
  }

  private def session(master: String, totalCores: Int, jar: Option[String]): SparkSession = {
    // a stopped session would otherwise be returned by getOrCreate with
    // the OLD master; force a genuinely fresh context per parallelism
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    var b = SparkSession.builder()
      .master(master)
      // 3x cores: smooths stage tails (a straggler task idles fewer cores)
      .config("spark.sql.shuffle.partitions", (totalCores * 3).toString)
      // 32 MB input splits: the scan stage gets ~4 waves per core instead
      // of one — a transiently-stalled task costs a fraction of a wave,
      // not +100% of stage wall (this VM stalls single vCPUs at random)
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.shuffle.compress", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    jar.foreach { j =>
      b = b.config("spark.jars", j)
        // make each executor JVM genuinely 4-core-shaped: GC/common pools
        // sized for 4 CPUs, not the host's 32 — otherwise the small-N run
        // borrows host-wide JVM threads and deflates measured efficiency
        .config("spark.executor.extraJavaOptions",
          s"-XX:ActiveProcessorCount=$CoresPerExec")
    }
    if (master.startsWith("spark://")) {
      // external pinned standalone cluster: the level's size is selected
      // by cores.max — 4-core executors land on that many pinned workers
      b = b.config("spark.cores.max", totalCores.toString)
        .config("spark.executor.cores", CoresPerExec.toString)
        .config("spark.executor.memory", "5g")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

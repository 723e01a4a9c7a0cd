package graft

import org.apache.spark.sql.SparkSession
import graft.spark.{Pipeline, Transcripts}

/** Two-parallelism scaling evidence (BASELINE.json: throughput@4N /
  * (4 x throughput@N) >= 0.8 between N and 4N executors; sandbox proxy =
  * local[N] vs local[4N] on the same input — see the task brief and
  * BASELINE.md).
  *
  * Protocol: materialize the transcripts input once to parquet (so both
  * runs read identical bytes), then run the full extraction pipeline
  * (salted repartition -> mapPartitions parse/extract -> reassembly) at
  * local[N] and local[4N], each in a fresh SparkSession, warmup + timed
  * run each. Prints one JSON line.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft-scale").toString

    // 1) materialize the input once. Replicate the derived transcripts
    // (distinct conv_ids per replica) so the job is long enough for the
    // parallel fraction to dominate fixed job overhead — at sf0.1 the
    // warm job is ~3s, all scheduling constant.
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "8").toInt
    locally {
      import org.apache.spark.sql.functions._
      val s = session(32)
      val t = Transcripts.derive(s, sfDir)
      t.withColumn("rep", explode(array((0 until repl).map(lit): _*)))
        .withColumn("conv_id", concat(col("conv_id"), lit("-r"), col("rep")))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$work/transcripts")
      s.stop()
    }

    var cnt = 0L
    def timed(cores: Int): Double = {
      val s = session(cores)
      val turns = s.read.parquet(s"$work/transcripts")
      // warmup (JIT + page cache): one full untimed pass
      Bench.runQuery(Pipeline.reassembled(Pipeline.extractTurns(turns)).toDF())
      cnt = turns.count()
      val t0 = System.nanoTime()
      Bench.runQuery(Pipeline.reassembled(Pipeline.extractTurns(turns)).toDF())
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      sec
    }

    // alternate levels twice, min per level — damps the shared-box noise
    // and removes first-run cache bias
    val secN = math.min(timed(n), timed(n))
    val sec4N = math.min(timed(4 * n), timed(4 * n))
    val secN2 = math.min(secN, timed(n))
    val thrN = cnt / secN2
    val thr4N = cnt / sec4N
    val eff = thr4N / (4.0 * thrN)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cores":$n,"n4_cores":${4 * n},"turns":$cnt,"sec_n":$secN2%.2f,"sec_4n":$sec4N%.2f,"turns_per_sec_n":$thrN%.1f,"turns_per_sec_4n":$thr4N%.1f,"sf":"$sfDir"}""")
  }

  private def session(cores: Int): SparkSession = {
    // a stopped session would otherwise be returned by getOrCreate with
    // the OLD master; force a genuinely fresh context per parallelism
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      // 3x cores: smooths stage tails (a straggler task idles fewer cores)
      .config("spark.sql.shuffle.partitions", (cores * 3).toString)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

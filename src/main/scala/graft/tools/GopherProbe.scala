package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Filtering

/** A/B probe: Filtering.repetitionStats (interpreted Catalyst HOF gram
  * build + array_sort + aggregate run-length pass) vs a compiled
  * per-partition walk over UTF-8 byte-array grams, on the curation-v2
  * planted universe at sf0.1. Run: sbt "runMain graft.tools.GopherProbe [sfDir]"
  */
object GopherProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" shared boiler plate sentence appended to exercise span level dedup")))
          .otherwise(col("text")).as("text"))
      .localCheckpoint()
    println(s"docs=${planted.count()}")

    def decl = Filtering.repetitionStats(planted)

    def compiled = {
      planted.select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          it.map { case (id, lang, textOrNull) =>
            val text = if (textOrNull == null) "" else textOrNull
            val words = text.split(" ", -1)
            val wb = new Array[Array[Byte]](words.length)
            var i = 0
            while (i < words.length) {
              wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
              i += 1
            }
            (id, lang, textOrNull, words.length,
              runTop(grams(wb, 2)), runDup(grams(wb, 3)))
          }
        }
        .toDF("doc_id", "lang", "text", "n_words", "top2_chars", "dup3_chars")
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("decl-noop") { decl.write.format("noop").mode("overwrite").save() }
      t("compiled-noop") { compiled.write.format("noop").mode("overwrite").save() }
    }
    val a = decl.select(col("doc_id"), col("n_words"), col("top2_chars"), col("dup3_chars"))
    val b = compiled.select(col("doc_id"), col("n_words"), col("top2_chars"), col("dup3_chars"))
    println(s"only_decl=${a.exceptAll(b).count()} only_comp=${b.exceptAll(a).count()}")
    spark.stop()
  }

  /** Sorted n-gram byte arrays (gram = words joined by 0x20). */
  private def grams(wb: Array[Array[Byte]], n: Int): Array[Array[Byte]] = {
    if (wb.length < n) return Array.empty
    val out = new Array[Array[Byte]](wb.length - n + 1)
    var i = 0
    while (i <= wb.length - n) {
      var len = n - 1
      var j = 0
      while (j < n) { len += wb(i + j).length; j += 1 }
      val g = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { g(p) = ' '; p += 1 }
        System.arraycopy(wb(i + j), 0, g, p, wb(i + j).length)
        p += wb(i + j).length
        j += 1
      }
      out(i) = g
      i += 1
    }
    java.util.Arrays.sort(out, cmp)
    out
  }

  private val cmp = new java.util.Comparator[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
  }

  /** bytes covered by the most frequent gram (count >= 2, ties to the
    * first run in sorted order — strict > keeps it). */
  private def runTop(sorted: Array[Array[Byte]]): Long = {
    var best = 0L; var top = 0L
    var i = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length && cmp.compare(sorted(j), sorted(i)) == 0) j += 1
      val run = (j - i).toLong
      if (run >= 2L && run > best) top = run * sorted(i).length
      if (run > best) best = run
      i = j
    }
    top
  }

  /** total bytes over all occurrences of grams appearing >= 2 times. */
  private def runDup(sorted: Array[Array[Byte]]): Long = {
    var dup = 0L
    var i = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length && cmp.compare(sorted(j), sorted(i)) == 0) j += 1
      val run = (j - i).toLong
      if (run >= 2L) dup += run * sorted(i).length
      i = j
    }
    dup
  }
}

package graft.spark

import org.apache.spark.sql.functions._

/** Contracts for paragraph-level dedup and training-order
  * materialization: paragraph dedup matches a brute-force corpus replay
  * (first occurrence by (doc_id, idx) wins, docs never vanish, counters
  * reconcile), epoch mixing replicates exactly per domain and fails
  * loudly on an unmapped domain, and the training order is a total,
  * deterministic, partitioning-independent permutation whose shard is a
  * prefix of its order key.
  */
class MixingSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDocs(texts: Seq[String]) =
    spark.createDataset(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")

  /** Brute-force reference for [[Dedup.paragraphDedup]]. */
  private def brute(texts: Seq[String], sep: String = "\n"): Map[Long, (String, Long, Long)] = {
    val exploded = texts.zipWithIndex.flatMap { case (t, d) =>
      t.split(java.util.regex.Pattern.quote(sep), -1).zipWithIndex
        .map { case (p, i) => (d.toLong, i, p) }
    }
    val winner = exploded.groupBy(_._3).view
      .mapValues(_.map { case (d, i, _) => (d, i) }.min).toMap
    texts.indices.map { d =>
      val paras = texts(d).split(java.util.regex.Pattern.quote(sep), -1).zipWithIndex
      val kept = paras.collect { case (p, i) if winner(p) == (d.toLong, i) => p }
      d.toLong -> ((kept.mkString(sep), paras.length.toLong, kept.length.toLong))
    }.toMap
  }

  test("paragraphDedup matches brute force: boilerplate, empties, total-loss docs") {
    val texts = Seq(
      "alpha beta\nBOILER\ngamma",   // first occurrence of BOILER
      "delta\nBOILER",               // loses BOILER
      "BOILER",                      // loses everything -> empty text, still a row
      "eps\n\nzeta",                 // owns the first empty paragraph
      "\nBOILER\n",                  // loses all three (empty, BOILER, empty)
      "alpha beta\nBOILER\ngamma")   // exact doc dup: every paragraph already seen
    val out = Dedup.paragraphDedup(mkDocs(texts))
      .select($"doc_id", $"text", $"n_paras", $"n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == texts.indices.map(_.toLong).toSet) // no silent row drops
    val ref = brute(texts)
    texts.indices.foreach { d =>
      assert(out(d.toLong) == ref(d.toLong), s"doc $d")
    }
    assert(out(2L)._1 == "" && out(2L)._3 == 0L) // total loss is observable, not absent
  }

  test("paragraphDedup is partitioning-independent and idempotent") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("a", "b", "c", "d")
    val texts = Seq.tabulate(80)(_ =>
      Seq.fill(rnd.nextInt(5) + 1)(vocab(rnd.nextInt(vocab.length))).mkString("\n"))
    val ref = brute(texts)
    for (n <- Seq(1, 7)) {
      val out = Dedup.paragraphDedup(mkDocs(texts).repartition(n))
        .select($"doc_id", $"text", $"n_paras", $"n_kept")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out == ref, s"repartition($n)")
    }
    // idempotent: a deduped corpus has no cross-doc duplicate paragraphs
    // left except paragraphs that became EQUAL by deletion (e.g. two
    // total-loss docs are both ""), so run-twice must keep every doc's
    // first-pass text except where the first pass manufactured new
    // duplicates — check the common case: all non-empty outputs stable
    val once = Dedup.paragraphDedup(mkDocs(texts))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val onceDf = spark.createDataset(once.toSeq).toDF("doc_id", "text")
    val twice = Dedup.paragraphDedup(onceDf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val refTwice = brute(texts.indices.map(i => once(i.toLong)))
    texts.indices.foreach(i => assert(twice(i.toLong) == refTwice(i.toLong)._1))
  }

  test("epochMix replicates per domain and fails loudly on an unmapped domain") {
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("doc_id", "lang")
    val out = Mixing.epochMix(df, col("lang"), Map("en" -> 3, "de" -> 1))
      .select($"doc_id", $"epoch").as[(Long, Int)].collect().sorted
    assert(out.toSeq == Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (3L, 1), (3L, 2), (3L, 3)))
    val bad = Mixing.epochMix(df, col("lang"), Map("en" -> 2)) // 'de' unmapped
    val ex = intercept[Exception](bad.collect())
    assert(ex.getMessage != null || ex.getCause != null) // raise_error surfaces, not a silent drop
  }

  test("trainingOrder is a deterministic total permutation; shard prefixes its key") {
    val df = (0L until 200L).map(i => (i, s"d${i % 4}")).toDF("doc_id", "lang")
    def run(n: Int) = Mixing.trainingOrder(df.repartition(n), col("doc_id"),
        shardHexDigits = 1, salt = "t")
      .select($"doc_id", $"order_key", $"shard", $"ord")
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    val a = run(1)
    val b = run(13)
    assert(a.toSeq == b.toSeq) // partitioning-independent
    assert(a.forall { case (_, ok, sh, _) => ok.startsWith(sh) })
    // within a shard, ord is dense 1..n and ordered exactly by order_key
    a.groupBy(_._3).foreach { case (_, rows) =>
      val byOrd = rows.sortBy(_._4)
      assert(byOrd.map(_._4).toSeq == (1 to rows.length))
      assert(byOrd.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    }
    // reading shards in order and rows by ord visits every copy once
    assert(a.map(r => (r._3, r._4)).distinct.length == a.length)
    // a null key must fail loudly — it would otherwise get a NULL
    // order_key/shard and drop out of the total order silently
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    val ex = intercept[Exception](
      Mixing.trainingOrder(withNull, col("doc_id")).collect())
    assert(ex.getMessage.contains("non-null unique key") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-null unique key")))
  }

  test("temperatureMix: fractional repeats match the per-row hash rule; unmapped domain fails loudly") {
    val d = spark.range(0, 400).toDF("doc_id")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "a").otherwise("b").as("dom"))
    // a: 1.5x (1 + frac 0x8000), b: 0.25x pure downsample (0 + 0x4000)
    val out = Mixing.temperatureMix(d, col("dom"), col("doc_id"),
        Map("a" -> 98304, "b" -> 16384), salt = "t")
      .as[(Long, String, Int)].collect()
    // per-row reference: copies = whole + (first 4 md5 hex chars < frac)
    def bucket(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$id".getBytes("UTF-8"))
      md.take(2).map(b => f"${b & 0xff}%02x").mkString
    }
    val want = (0L until 400L).flatMap { id =>
      val (whole, frac) = if (id % 2 == 0) (1, "8000") else (0, "4000")
      val n = whole + (if (bucket(id) < frac) 1 else 0)
      (1 to n).map(e => (id, if (id % 2 == 0) "a" else "b", e))
    }.toSet
    assert(out.toSet == want)
    // expected-volume sanity: each domain's copy count is within a few
    // sigma of rate * n (the hash is uniform on 4 hex digits)
    val aCopies = out.count(_._2 == "a")
    val bCopies = out.count(_._2 == "b")
    assert(math.abs(aCopies - 300) < 60, s"a copies: $aCopies")
    assert(math.abs(bCopies - 50) < 40, s"b copies: $bCopies")
    // unmapped domain: loud failure, not a silent drop
    val ex2 = intercept[Exception](
      Mixing.temperatureMix(d, lit("zz"), col("doc_id"),
        Map("a" -> 65536), salt = "t").collect())
    assert(ex2.getMessage.contains("without a repeat factor") ||
      Option(ex2.getCause).exists(_.getMessage.contains("without a repeat factor")))
  }
}

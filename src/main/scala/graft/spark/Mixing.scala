package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-order materialization: domain mixing with per-domain epoch
  * upsampling, and a deterministic global shuffle into ordered shards —
  * the last stage of a training-data pipeline, where the curated corpus
  * becomes the sequence the trainer actually reads.
  *
  * Determinism contract (shared with [[Filtering.hashSample]] /
  * [[Filtering.assignSplit]]): every decision — how many copies of a
  * document exist, where each copy lands in the global order, which
  * shard serves it — is a pure function of (salt, key). Re-running the
  * job, changing the cluster size, or retrying a task reproduces the
  * byte-identical training order; `rand()`-based shuffling loses all
  * three properties under speculative execution.
  *
  * Scale notes (the 100 TB shapes):
  *  - [[epochMix]] is a broadcast join (the repeats table is a handful
  *    of rows) plus an explode — shuffle-free, scan-speed. Upsampling
  *    by repeat factor r multiplies bytes r×: at 100 TB, apply it
  *    AFTER budget selection, not before.
  *  - [[trainingOrder]] is the one stage that is inherently a sort —
  *    a reproducible global order cannot cost less. The plan keeps the
  *    sort DISTRIBUTED: the md5 order key is uniform, so its hex
  *    prefix range-partitions the corpus into 16^k equal-expectation
  *    shards; each shard sorts independently (one exchange, per-shard
  *    sort, no global single-reducer stage), and shard files are what
  *    a data-parallel trainer consumes anyway. Choose k so a shard's
  *    rows fit a task's spill budget (k=3 → 4096 shards ≈ 24 GB each
  *    at 100 TB).
  */
object Mixing {

  /** Per-domain epoch upsampling: each row is replicated `repeats(domain)`
    * times, tagged with `epoch` ∈ [1, repeats]. Repeat factors travel as
    * DATA through a broadcast join (at 100 TB they come from an upstream
    * mixture computation, not code). A domain absent from `repeats`
    * fails LOUDLY at execution (left join + raise_error on the unmatched
    * row) — an inner join would silently drop the whole domain, the
    * exact failure mode the no-silent-drop contract forbids.
    */
  def epochMix(df: DataFrame, domainCol: Column,
               repeats: Map[String, Int]): DataFrame = {
    require(repeats.nonEmpty, "epochMix needs at least one domain")
    repeats.values.foreach(r => require(r >= 1, s"repeat factor must be >= 1, got $r"))
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = repeats.toSeq.toDF("__domain", "__rep")
    val rep = when(col("__rep").isNull,
        raise_error(concat(lit("epochMix: domain without a repeat factor: "),
          coalesce(domainCol.cast("string"), lit("NULL")))).cast("int"))
      .otherwise(col("__rep"))
    df.join(broadcast(rdf), domainCol === col("__domain"), "left")
      .withColumn("epoch", explode(sequence(lit(1), rep)))
      .drop("__domain", "__rep")
  }

  /** Per-domain FRACTIONAL mixture sampling — the temperature-sampling
    * step of multilingual/multi-source training mixes (mT5/XLM-R style:
    * p_domain ∝ share^(1/T) turns into a per-domain repeat factor that
    * is rarely a whole number): each row gets `floor(r)` copies always,
    * plus one more iff its deterministic hash bucket falls below the
    * fractional part — so a domain with r = 1.5 emits exactly its
    * expected 1.5× volume, decided per-ROW by the same (salt, key) hash
    * contract as [[Filtering.hashSample]] (retries, cluster size, and
    * partitioning cannot change the mix). r < 1 DOWNSAMPLES — rows with
    * zero copies drop, which here is the operator's semantics (a
    * sampler, like hashSample), not a silent loss; the volume is
    * auditable from the output epochs.
    *
    * Repeat factors are FIXED-POINT in 1/65536 units (98304 = 1.5×),
    * the hashSample rate convention: the fractional comparison is a
    * 4-hex-digit string compare against md5's prefix, identical in
    * Spark and ANSI SQL — no float thresholds. A domain absent from
    * `repeatsOf65536` (null included) fails loudly (the [[epochMix]]
    * left-join + raise_error pattern). Same broadcast-join + explode
    * shape as epochMix: shuffle-free, scan-speed.
    */
  def temperatureMix(df: DataFrame, domainCol: Column, keyCol: Column,
                     repeatsOf65536: Map[String, Int],
                     salt: String = "s0"): DataFrame = {
    require(repeatsOf65536.nonEmpty, "temperatureMix needs at least one domain")
    repeatsOf65536.values.foreach(r =>
      require(r >= 0, s"repeat factor must be >= 0/65536, got $r"))
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = repeatsOf65536.toSeq
      .map { case (d, r) => (d, r / 65536, f"${r % 65536}%04x") }
      .toDF("__domain", "__whole", "__frachex")
    // null key guard: a null would hash to a null bucket and the `<`
    // below would silently deny the fractional copy (Filtering.hashBucket)
    val k = when(keyCol.isNull,
      raise_error(lit("temperatureMix key is NULL — the per-row copy " +
        "decision needs a non-null key")).cast("string"))
      .otherwise(keyCol.cast("string"))
    val bucket = substring(md5(concat(lit(salt + ":"), k)), 1, 4)
    val whole = when(col("__whole").isNull,
      raise_error(concat(lit("temperatureMix: domain without a repeat factor: "),
        coalesce(domainCol.cast("string"), lit("NULL")))).cast("int"))
      .otherwise(col("__whole"))
    val copies = whole + when(bucket < col("__frachex"), 1).otherwise(0)
    df.join(broadcast(rdf), domainCol === col("__domain"), "left")
      .withColumn("epoch",
        explode(when(copies >= 1, sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
      .drop("__domain", "__whole", "__frachex")
  }

  /** Deterministic global shuffle into ordered shards: order key =
    * md5(salt ':' key), shard = the key's first `shardHexDigits` hex
    * digits (16^k equal-expectation shards), `ord` = the row's position
    * within its shard (dense, 1-based). Reading shards in shard order
    * and rows in `ord` order is THE training order; it is total because
    * ties on the md5 break on `key` itself — so duplicate keys are the
    * only way to get a nondeterministic order, and the caller's key
    * must be unique (e.g. doc_id, or concat(doc_id, ':', epoch) after
    * [[epochMix]]).
    *
    * The shard is a STRING hex prefix, not a modulo — it compares
    * identically in Spark and ANSI SQL, and it is a prefix of the order
    * key, so shard assignment and within-shard order derive from the
    * same hash walk (a row's shard never disagrees with its position).
    */
  def trainingOrder(df: DataFrame, keyCol: Column,
                    shardHexDigits: Int = 1,
                    salt: String = "s0"): DataFrame = {
    require(shardHexDigits >= 1 && shardHexDigits <= 8,
      s"shardHexDigits out of range: $shardHexDigits")
    import org.apache.spark.sql.expressions.Window
    // a NULL key would yield a NULL order key AND a NULL shard — the row
    // falls out of the total order silently (and ties among null keys
    // are nondeterministic). Fail loudly, like the hash-key guard in
    // Filtering.hashBucket.
    val keyStr = when(keyCol.isNull,
      raise_error(lit("trainingOrder key is NULL — the total order needs a " +
        "non-null unique key")).cast("string"))
      .otherwise(keyCol.cast("string"))
    val ok = md5(concat(lit(salt + ":"), keyStr))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("order_key").asc, keyCol.cast("string").asc)
    df.withColumn("order_key", ok)
      .withColumn("shard", substring(col("order_key"), 1, shardHexDigits))
      .withColumn("ord", row_number().over(w))
  }
}

package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language-model quality scoring — the CCNet/RedPajama/FineWeb
  * curation step: train an n-gram model on a reference corpus, score
  * every document's per-token surprisal against it, and filter on the
  * mean. Low surprisal = fluent in-domain text; high = boilerplate,
  * non-prose, or the wrong language (the classic use trains on a clean
  * target-language corpus — here the `lang = 'en'` slice — so foreign
  * and garbled docs surface together).
  *
  * Surprisal is INTEGER-QUANTIZED by design: per bigram, the score is
  * `floor(log2(c_prefix)) - floor(log2(c_bigram))` — the bit-bucket
  * version of the add-nothing conditional -log2 p(w2|w1). floor(log2)
  * of a positive BIGINT is exactly the bit length minus one, which
  * every engine computes identically (IEEE log2 of an exact integer
  * cannot straddle a floor boundary for counts < 2^40: powers of two
  * are exact, and the nearest non-power is whole ulps away from the
  * boundary) — so doc scores replay hash-exact in ANSI SQL, keeping
  * the repo's no-float-hashing oracle contract. The quantization
  * preserves the ranking the filter needs (a bucket is a factor-of-2
  * band in probability); a production deployment wanting true KenLM
  * perplexity plugs its scorer in via mapInPandas and keeps this plan
  * shape.
  *
  * Scale shape (the 100 TB walk): the MODEL is bounded by construction
  * — `minCount` pruning caps it the same way CCNet ships a pruned
  * KenLM — so scoring is a BROADCAST join against the scan-side bigram
  * explode, and the per-doc aggregate partial-aggregates map-side: ONE
  * exchange of (doc_id, three longs) for the whole scoring pass.
  * Training is one groupBy over the reference corpus's bigrams (hash
  * aggregate, map-side partial) plus a prefix-count aggregate reusing
  * the same scan.
  */
object LmScore {

  /** Bigram model (w1, w2, c12, c1) over a reference corpus: c12 =
    * corpus count of the bigram, c1 = count of w1 as a bigram PREFIX
    * (so c12 <= c1 and the quantized surprisal is never negative).
    * Only bigrams with c12 >= minCount are kept — the pruning that
    * bounds the model (and makes it broadcastable) at corpus scale;
    * c1 is counted BEFORE pruning, so pruning never inflates
    * p(w2|w1). Null text folds to ''.
    */
  def trainBigramModel(ref: DataFrame, minCount: Long = 2,
                       textCol: String = "text"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bigrams = explodeBigrams(ref, textCol).select(col("w1"), col("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    c12.filter(col("c12") >= minCount).join(c1, Seq("w1"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"))
  }

  /** Per-doc quantized surprisal against a trained model:
    * (idCol, n_bigrams, n_oov, surprisal_bits, keep). Bigrams absent
    * from the model cost `oovBits` each (the unseen-event penalty —
    * with minCount pruning, "OOV" includes rare-but-seen bigrams,
    * exactly as with a pruned production LM). keep is the mean-
    * surprisal filter in integer cross-multiplication:
    * surprisal_bits * 100 <= maxCentibitsPerBigram * n_bigrams — no
    * division, replays exactly. Every input doc appears in the output
    * (docs with < 2 words have zero bigrams and keep = true: no
    * evidence is not evidence of junk) — the no-silent-drop contract.
    *
    * The model side is broadcast: boundedness is the model's contract
    * (minCount pruning); a model too big to broadcast means the
    * pruning threshold is wrong, not that this join should shuffle.
    */
  def scoreAgainstModel(docs: DataFrame, model: DataFrame,
                        oovBits: Int = 30,
                        maxCentibitsPerBigram: Int = 800,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(oovBits >= 0, s"oovBits must be >= 0, got $oovBits")
    val m = broadcast(model.select(col("w1"), col("w2"),
      (floor(log2(col("c1"))) - floor(log2(col("c12")))).cast("long").as("bits")))
    val scored = explodeBigrams(docs, textCol, idCol)
      .join(m, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("bits").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("bits"), lit(oovBits.toLong))).as("surprisal_bits"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"))
      .withColumn("keep",
        col("surprisal_bits") * 100 <=
          lit(maxCentibitsPerBigram).cast("long") * col("n_bigrams"))
  }

  /** (idCol?, w1, w2) for every adjacent word pair; docs with < 2
    * words emit no rows (callers re-attach them — see
    * [[scoreAgainstModel]]'s final left join).
    */
  private def explodeBigrams(df: DataFrame, textCol: String,
                             idCol: String = null): DataFrame = {
    val ws = col("ws")
    val pairs = when(size(ws) >= 2, sequence(lit(1), size(ws) - 1))
      .otherwise(array().cast("array<int>"))
    val base = if (idCol == null) df.select(split(coalesce(col(textCol), lit("")), " ").as("ws"))
      else df.select(col(idCol), split(coalesce(col(textCol), lit("")), " ").as("ws"))
    val keep: Seq[Column] = if (idCol == null) Seq.empty else Seq(col(idCol))
    base.select(keep :+
      explode(transform(pairs, i =>
        struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
        .as("b"): _*)
      .select(keep :+ col("b.w1").as("w1") :+ col("b.w2").as("w2"): _*)
  }
}

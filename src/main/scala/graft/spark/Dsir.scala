package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): estimate how
  * target-like each raw document is from hashed n-gram statistics,
  * then resample the raw corpus with importance weights — the standard
  * "make the web corpus look like the target domain" curation step.
  *
  * The published recipe hashes word unigrams+bigrams into B buckets,
  * fits bag-of-buckets models p_target / p_raw, scores each doc by the
  * summed log-likelihood ratio, and Gumbel-top-k resamples. This
  * implementation keeps that structure but makes every step
  * integer-exact (the repo's no-float-hashing oracle contract):
  *
  *  - buckets: 4-hex md5 prefix (B = 65536), type-salted `u:`/`b:` so
  *    unigram and bigram features cannot systematically collide
  *    (within-type collisions remain, as in the paper — they are part
  *    of the hashed-feature design, identical in both engines);
  *  - the per-bucket log ratio is quantized to bit-buckets:
  *    floor(log2 c_target) - floor(log2 c_raw), the [[LmScore]] trick
  *    (floor(log2) of a BIGINT is its bit length minus one — exact in
  *    every engine for counts < 2^40). target ⊆ raw makes the value
  *    ≤ 0, with 0 = "this feature occurs only in target-like docs";
  *  - resampling: a deterministic md5-coin Bernoulli whose keep rate
  *    is banded on the doc's MEAN score (integer cross-multiplication,
  *    no division) — quantized importance weights in the same /65536
  *    idiom as [[Filtering.hashSample]], so the whole selection
  *    replays verbatim in ANSI SQL.
  *
  * Scale shape (the 100 TB walk): the model is ONE conditional
  * aggregate over one corpus scan (c_raw = count, c_target = count
  * where isTarget — the target slice never needs a second scan),
  * bounded at B rows BY CONSTRUCTION → always broadcastable. Scoring
  * is a scan-side feature explode + broadcast join + map-side partial
  * aggregate: ONE exchange of (doc_id, two longs). Resampling is a
  * projection over the scored table.
  */
object Dsir {

  private def wordsOf(textCol: Column): Column =
    filter(split(coalesce(textCol, lit("")), " "), w => w =!= "")

  /** Hashed unigram+bigram feature buckets of a text (array of 4-hex
    * md5 prefixes; empty for wordless docs).
    */
  private def featureBuckets(textCol: Column): Column = {
    val ws = wordsOf(textCol)
    val n = size(ws)
    val unis = transform(ws, w => substring(md5(concat(lit("u:"), w)), 1, 4))
    // greatest(..., 0): slice rejects a negative length, and a wordless
    // doc has n - 1 = -1
    val m = greatest(n - 1, lit(0))
    val bis = zip_with(
      slice(ws, lit(1), m), slice(ws, lit(2), m),
      (a, b) => substring(md5(concat(lit("b:"), a, lit(" "), b)), 1, 4))
    concat(unis, bis)
  }

  /** Bucket-level importance model over ONE corpus scan:
    * (bucket, bits) where bits = floor(log2 c_target) - floor(log2
    * c_raw), for buckets seen in the target slice at least once.
    * `isTarget` marks the target rows (e.g. `col("lang") === "en"`);
    * a null flag fails loudly — a silently-dropped target row would
    * corrupt the model with no trace.
    */
  def featureModel(docs: DataFrame, isTarget: Column,
                   textCol: String = "text"): DataFrame = {
    val t = when(isTarget.isNull,
      raise_error(lit("Dsir.featureModel: isTarget is NULL for some row — " +
        "supply a total target predicate")).cast("boolean"))
      .otherwise(isTarget)
    docs
      .select(explode(featureBuckets(col(textCol))).as("bucket"), t.as("t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw"), count(when(col("t"), 1)).as("c_target"))
      .filter(col("c_target") >= 1)
      .select(col("bucket"),
        (floor(log2(col("c_target"))) - floor(log2(col("c_raw"))))
          .cast("long").as("bits"))
  }

  /** Per-doc importance score against a [[featureModel]]:
    * (idCol, n_feats, score_bits, keep). Buckets absent from the model
    * (never seen in the target slice) cost `oovBits` each. keep is the
    * mean-score filter in integer cross-multiplication:
    * score_bits * 100 >= minCentibits * n_feats. Every input doc
    * appears in the output; wordless docs score (0, 0, true) — no
    * evidence is not evidence of off-target (the no-silent-drop
    * contract, same convention as [[LmScore.scoreAgainstModel]]).
    */
  def score(docs: DataFrame, model: DataFrame,
            oovBits: Int = 20, minCentibits: Int = -300,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(oovBits >= 0, s"oovBits must be >= 0, got $oovBits")
    // explode_outer: a doc with no features still emits one null-bucket
    // row, so it survives the aggregate with (0, 0)
    val feats = docs.select(col(idCol),
      explode_outer(featureBuckets(col(textCol))).as("bucket"))
    val m = broadcast(model.select(col("bucket").as("__b"), col("bits")))
    feats
      .join(m, col("bucket") === col("__b"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("bucket")).as("n_feats"),
        sum(when(col("bucket").isNull, lit(0L))
          .otherwise(coalesce(col("bits"), lit(-oovBits.toLong))))
          .as("score_bits"))
      .select(col(idCol), col("n_feats"),
        col("score_bits"),
        (col("score_bits") * 100 >= lit(minCentibits.toLong) * col("n_feats"))
          .as("keep"))
  }

  /** Importance resampling with quantized weights: a deterministic
    * md5-coin Bernoulli whose keep rate depends on the doc's MEAN
    * score band. `bands` maps a mean-centibit threshold to a /65536
    * keep rate, in STRICTLY DESCENDING threshold order (first matching
    * band wins); docs below every threshold keep at `floorRate`. The
    * band test is integer cross-multiplication (score_bits * 100 >=
    * thr * n_feats) — no division, exact in both engines. Expects
    * [[score]] output (or anything with idCol/n_feats/score_bits).
    */
  def resample(scored: DataFrame, bands: Seq[(Int, Int)], floorRate: Int,
               salt: String = "dsir", idCol: String = "doc_id"): DataFrame = {
    require(bands.nonEmpty, "resample needs at least one band")
    require(bands.map(_._1) == bands.map(_._1).sorted.reverse &&
      bands.map(_._1).distinct.size == bands.size,
      s"band thresholds must be strictly descending, got ${bands.map(_._1)}")
    (bands.map(_._2) :+ floorRate).foreach(r =>
      require(r >= 0 && r <= 65536, s"rate out of range: $r"))
    val rate = bands.foldRight(lit(Filtering.thresholdHex(floorRate))) {
      case ((thr, r), below) =>
        when(col("score_bits") * 100 >= lit(thr.toLong) * col("n_feats"),
          lit(Filtering.thresholdHex(r))).otherwise(below)
    }
    scored.filter(Filtering.hashBucket(col(idCol), salt) < rate)
  }
}

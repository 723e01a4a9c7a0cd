package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016) — the step after [[Vocab]]'s frequency induction in a real
  * tokenizer build: learn the top merge rules from corpus statistics,
  * then segment the corpus with them.
  *
  * Representation: a word's segmentation is a string of bar-wrapped
  * symbols separated by single spaces — `"abc"` starts as
  * `"|a| |b| |c|"`. Applying merge (l, r) is then ONE standard SQL
  * `replace(seg, "|l| |r|", "|lr|")`: `replace` scans left-to-right and
  * never re-matches inside a replacement, which is EXACTLY classic
  * BPE's within-word merge order (`"a a a"` + (a,a) -> `"aa a"`), and
  * the bars make the pattern alignment-safe (a symbol's interior chars
  * never abut `|` on both sides, so `"|a| |b|"` cannot match the tail
  * of `"|ba|"`). The same replace runs verbatim in DuckDB, which is
  * what makes the whole training loop exactly replayable cross-engine.
  *
  * Scale notes (the 100 TB shapes):
  *  - the corpus is touched ONCE: the word-count aggregation (map-side
  *    partial). Everything after runs on the word-TYPE table —
  *    vocabulary-sized, not corpus-sized — which [[learn]] persists so
  *    the K merge iterations do not re-scan the corpus, and unpersists
  *    before returning (no pinned blocks outlive the call). Each
  *    iteration is one map-side-combinable pair-count agg over the
  *    types plus a ONE-row TakeOrdered collect: the argmax merge. A
  *    tokenizer model is a driver artifact by definition.
  *  - merges are inherently sequential — no parallelism exists across
  *    iterations in ANY BPE trainer. For production merge budgets
  *    (~50k), collect the mass-covering top-M word types to the driver
  *    after the distributed count and run the classic in-memory loop;
  *    this bounded distributed variant is the exact, plan-auditable
  *    shape for auditable merge budgets.
  *  - [[encode]] is a single shuffle-free projection (the learned
  *    merges are literals in the plan): per word, fold the K replaces
  *    and count symbols — runs at scan speed, raw text never shuffles.
  *
  * Determinism: pair argmax ties break on (count desc, left symbol asc,
  * right symbol asc) over the BAR-WRAPPED symbol strings — binary
  * comparison in both engines, so the learned merge sequence is
  * identical across runs, partitionings, and engines.
  */
object Bpe {

  /** Initial segmentation of a word: every char bar-wrapped.
    * `"abc"` -> `"|a| |b| |c|"`.
    */
  private def seg0(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", "\\|$1\\| "))

  /** Words of a text column: split on single spaces, empties dropped,
    * fail-loud if a word contains the `|` delimiter (it would corrupt
    * the segmentation encoding — no silent misparse).
    */
  private def wordsOf(textCol: Column): Column = {
    val ws = filter(split(coalesce(textCol, lit("")), " "), w => w =!= "")
    // assert_true returns null when every word is bar-free; a violation
    // raises with the message instead of corrupting segmentations
    when(assert_true(forall(ws, w => !w.contains("|")),
      lit("BPE delimiter '|' occurs in a corpus word — choose a " +
        "different delimiter or pre-clean the text")).isNull, ws)
  }

  /** Learn `nMerges` BPE merge rules from the corpus. Returns the merge
    * table in application order: (iter 1-based, l_sym, r_sym, merged,
    * cnt) — cnt is the pair's corpus frequency (weighted by word count)
    * at the time it was chosen. Fails loudly if the pair supply is
    * exhausted before `nMerges` (every word fused to one symbol).
    */
  def learn(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    // ONE corpus pass; the type table is vocabulary-sized — pin it so
    // the merge iterations never re-scan the corpus (unpersisted below)
    val types = docs
      .select(explode(wordsOf(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), seg0(col("word")).as("seg"))
      .persist()
    try {
      var seg = types
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      for (it <- 1 to nMerges) {
        val ws = split(col("seg"), " ")
        val n = size(ws)
        val pairs = zip_with(
          slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))
        val best = seg
          .select(col("cnt"), explode(pairs).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        require(best.nonEmpty,
          s"BPE pair supply exhausted at merge $it of $nMerges — every " +
            "word is a single symbol; lower nMerges")
        val (bl, br, bc) = best.head
        val inner = (s: String) => s.substring(1, s.length - 1)
        merges += ((it, inner(bl), inner(br), inner(bl) + inner(br), bc))
        // literal (non-regex) replace: left-to-right, never re-matching
        // inside a replacement — identical to SQL replace in DuckDB
        seg = seg.withColumn("seg",
          replace(col("seg"), lit(s"$bl $br"),
            lit(s"|${inner(bl)}${inner(br)}|")))
      }
      merges.result().toDF("iter", "l_sym", "r_sym", "merged", "cnt")
    } finally types.unpersist()
  }

  /** BPE token count of a text column under `merges` — the column form
    * of [[encode]], usable on any text (e.g. a chunk's) anywhere a
    * projection fits. Merges are baked into the plan as literals, so
    * the count runs at scan speed with no shuffle and no UDF. A text
    * with no words counts 0.
    */
  def tokenCount(textCol: Column, merges: Seq[(String, String)]): Column = {
    val segFinal = (w: Column) => merges.foldLeft(seg0(w)) {
      case (c, (l, r)) => replace(c, lit(s"|$l| |$r|"), lit(s"|$l$r|"))
    }
    aggregate(wordsOf(textCol), lit(0L),
      (acc, w) => acc + size(split(segFinal(w), " ")).cast("long"))
  }

  /** Apply learned merges to every word of every doc and report
    * (doc_id, n_words, n_tokens) — the token-budget number a training
    * pipeline feeds into [[Chunking]]/[[Packing]] sizing. `merges` is
    * the (l_sym, r_sym) sequence in application order (collect it from
    * [[learn]] — K rows, a driver artifact like the IVF centroids).
    * Shuffle-free: one projection, merges baked in as literals. Docs
    * with no words report (0, 0).
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      size(wordsOf(col(textCol))).cast("long").as("n_words"),
      tokenCount(col(textCol), merges).as("n_tokens"))
}

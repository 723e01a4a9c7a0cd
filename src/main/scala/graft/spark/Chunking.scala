package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-sequence preparation: split each doc
  * into fixed-size token windows with overlap — the op that sits
  * between token counting and sequence packing in an LLM data pipeline.
  *
  * Tokens are whitespace words (the same unit as
  * [[graft.text.TextAnalysis.wsTokenCount]] on single-space text), so
  * the whole operator is a PROJECTION over built-in codegen'd
  * functions (split / sequence / posexplode / slice / array_join): no
  * UDF, no shuffle, embarrassingly parallel over the scan — at 100 TB
  * this runs at scan speed and the parquet reader prunes to
  * (doc_id, text).
  *
  * Chunk layout: starts at 0, step = maxTokens - overlap; every word
  * lands in at least one chunk; consecutive chunks share exactly
  * `overlap` words (the final chunk may be shorter). A doc with no
  * more than maxTokens words yields exactly one chunk.
  */
object Chunking {

  /** (doc_id, chunk_idx, chunk_text, n_tokens) for every chunk.
    *
    * The chunk structs are built INSIDE a `transform` over the start
    * sequence, BEFORE the explode: the first shape sliced after
    * posexplode, so every output row materialized with a copy of its
    * doc's full words array — measured +4 s on 130k conversations ->
    * 3M chunks at sf0.1. Building pre-explode keeps the per-row payload
    * at one chunk (total data = corpus x (1 + overlap share)).
    */
  def chunk(docs: DataFrame, maxTokens: Int = 512, overlap: Int = 64,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    val w: Column = col("w")
    val n: Column = size(w)
    // last start: the largest multiple of step strictly below
    // max(1, n - overlap) — guarantees the final chunk is non-empty and
    // every word is covered
    val lastStart = (ceil((greatest(n - lit(overlap), lit(1))).cast("double")
      / lit(step)).cast("int") - 1) * lit(step)
    // coalesce: split(null) yields a null array and posexplode then emits
    // NO rows — null-text docs would vanish silently (ADVICE r4). An
    // empty string chunks like any other text (one chunk, [""]), so null
    // docs stay visible downstream.
    docs
      .select(col(idCol), split(coalesce(col(textCol), lit("")), " ").as("w"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lastStart, lit(step)), start =>
          struct(
            array_join(slice(w, start + 1, lit(maxTokens)), " ").as("chunk_text"),
            least(n - start, lit(maxTokens)).as("n_tokens"))))
          .as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))
  }
}

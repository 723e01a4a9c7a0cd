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

  /** (doc_id, chunk_idx, chunk_text, n_tokens) for every chunk. */
  def chunk(docs: DataFrame, maxTokens: Int = 512, overlap: Int = 64,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    val words: Column = split(col(textCol), " ")
    val n: Column = size(words)
    // last start: the largest multiple of step strictly below
    // max(1, n - overlap) — guarantees the final chunk is non-empty and
    // every word is covered
    val lastStart = (ceil((greatest(n - lit(overlap), lit(1))).cast("double")
      / lit(step)).cast("int") - 1) * lit(step)
    docs.select(col(idCol), words.as("w"),
        posexplode(sequence(lit(0), lastStart, lit(step)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("w"), col("start") + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(size(col("w")) - col("start"), lit(maxTokens)).as("n_tokens"))
  }
}

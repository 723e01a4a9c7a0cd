package graft.spark

import java.sql.Timestamp

/** The input-table shape mandated by BASELINE.json's input_hint:
  * an Iceberg (parquet stand-in here) table of multi-turn transcripts.
  */
final case class Turn(conv_id: String, turn_idx: Int, role: String,
                      text: String, tool: String, ts: Timestamp)

/** Per-turn extraction output (north_rule: extracted text/spans per turn). */
final case class SpanRec(start: Int, end: Int, kind: String)
final case class ExtractedTurn(conv_id: String, turn_idx: Int,
                               extracted_text: String, spans: Seq[SpanRec],
                               n_nodes: Int, n_errors: Int)

/** Relational encoding of one parsed DOM node (the integer-id arena from
  * SURVEY.md §1.2): pointer cycles (endtag/openertag) become ids; node_id
  * is pre-order, so ORDER BY node_id reproduces DFS document order.
  * kind: 0=text, 1=comment, 2=tag (open or nonpair), 3=endtag.
  */
final case class NodeRow(node_id: Int, parent_id: Int, pos: Int, depth: Int,
                         kind: Byte, tagname: String, raw: String,
                         params: Map[String, String], nonpair: Boolean,
                         endtag_id: Int, opener_id: Int, src_offset: Int)

/** Per-partition parse diagnostics row (pipeline metrics_diag table;
  * accumulator-sourced wall times — task retries may duplicate entries.
  * The committed `metrics` table is the retry-safe ledger: one row per
  * batch, aggregated from the written output + lineage).
  */
final case class PartitionMetrics(part_id: Int, n_turns: Long, n_bytes: Long,
                                  n_nodes: Long, n_errors: Long,
                                  n_oversize: Long, wall_ms: Long)

/** Lineage row: which input slice produced which output, with input byte
  * and oversize accounting per file (snapshot id is a deterministic
  * constant for the parquet stand-in; with Iceberg it is the table
  * snapshot).
  */
final case class LineageRec(snapshot_id: String, file: String,
                            row_count: Long, n_bytes: Long, n_oversize: Long)

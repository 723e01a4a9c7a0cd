package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Transcript-table access.
  *
  * `derive` builds the transcripts table deterministically from the
  * driver's parquet tables (lineitem x documents) with *algebraically
  * reproducible* text: every transformation is expressible in ANSI SQL,
  * so the DuckDB oracle can regenerate the exact input HTML and the
  * expected outputs of parse-level queries (SparkEntry.oracleSql). The
  * documents join is broadcast (dimension side is 500..5000 rows) — no
  * shuffle at any scale.
  */
object Transcripts {

  /** The HTML template. Two content blocks (document prose + order
    * facts) inside div#main, boilerplate around them. Shape chosen so:
    *  - toHtml round-trips the input exactly (all pair tags nonempty;
    *    quirk constructs chosen so raw-element serialization is identity);
    *  - extract_main output = "Conversation record\n" + doc + "\n" + facts
    *    for every variant (variant blocks contribute no kept text);
    *  - 3 hrefs per turn in document order;
    *  - 38-node base DOM + a turn_idx%11-selected quirk block.
    *
    * The quirk block (between `</footer>` and `</body>`) broadens the
    * DuckDB oracle beyond one fixed DOM shape (VERDICT r1 item 1):
    *  - v1 comment sibling: Q11 lexing, Q6 raw tagname, comment forced
    *    nonpair by parseDOM (dhtmlparser.d:903-904);
    *  - v2 void tags: Q4 nine-name nonpair list (br,hr,img,...);
    *  - v3 same-name nesting `<section><section>nested</section>`: Q17 —
    *    the OUTER opener is unmatched (indexOfEndTag counts the inner
    *    same-name opener, dhtmlparser.d:869-890) and becomes a nonpair
    *    LEAF; the inner one pairs with the endtag as its sibling;
    *  - v4 single-quoted attr with embedded `"`: Q8 both quote styles,
    *    Q12 tagToString re-escape (`title="say \"hi\" now"`);
    *  - v5 `<pre>` block: Q15 verbatim pre-mode in prettify (empty
    *    separator, inner whitespace preserved, dhtmlparser.d:545-548);
    *  - v6 spaced stray endtag `< /q3>`: Q3 (whitespace between `<` and
    *    `/` still classifies as endtag) + Q18 (stray endtags are DROPPED
    *    by parseDOM) — the one variant where toHtml != input;
    *  - v7 multi-attribute `<em id=.. class=..>`: Q27 — tagToString (and
    *    thus prettify) re-renders params in SORTED key order
    *    (dhtmlparser.d:533-545 sorted keys), while toHtml keeps the raw
    *    source order (Q13 raw-element reconstruction);
    *  - v8 nested `<ul><li>..</li><li>..</li></ul>`: two-level block
    *    nesting in the quirk slot — prettify indents the li children one
    *    level deeper (Q15 block mode) and the BFS level-order surfaces
    *    the li pairs a full level after the ul;
    *  - v9 bare attribute `<input disabled type="text">`: Q7 no-value
    *    param (bare key keeps its bare render, sorted before `type`) on
    *    a Q4 void tag (nonpair, no endtag);
    *  - v10 `<table><tr><td>..</td>..</tr></table>`: THREE-level block
    *    nesting — prettify indents td two levels past the slot and BFS
    *    surfaces tr then td a level at a time.
    */
  def textSqlExpr: String =
    """concat(
      |'<html><head><title>conv</title><meta charset="utf-8"></head><body>',
      |'<nav><a href="/home">Home</a> <a href="/about">About</a></nav>',
      |'<div class="main" id="main"><h1>Conversation record</h1>',
      |'<p>', dtext, '</p>',
      |'<p>order ', okey, ' line ', lnum, ' flag ', rf, ' status ', ls, '</p>',
      |'<a href="/ord/', okey, '/', lnum, '">details</a></div>',
      |'<footer><p>footer boilerplate text</p></footer>',
      |CASE CAST(turn_idx % 11 AS INT)
      |  WHEN 1 THEN '<!-- note 11 -->'
      |  WHEN 2 THEN '<br><hr><img src="/x.png">'
      |  WHEN 3 THEN '<section><section>nested</section>'
      |  WHEN 4 THEN concat('<span title=', chr(39), 'say "hi" now', chr(39), '>q</span>')
      |  WHEN 5 THEN '<pre> a  b </pre>'
      |  WHEN 6 THEN '< /q3>'
      |  WHEN 7 THEN '<em id="z2" class="a1">x</em>'
      |  WHEN 8 THEN '<ul><li>one</li><li>two</li></ul>'
      |  WHEN 9 THEN '<input disabled type="text">'
      |  WHEN 10 THEN '<table><tr><td>c1</td><td>c2</td></tr></table>'
      |  ELSE ''
      |END,
      |'</body></html>')"""
      .stripMargin.replace("\n", "")

  // One persisted copy per (session, dir): every harness query starts from
  // the same transcripts table; re-deriving (join + window) per query would
  // measure input *synthesis*, not the engine. In production the table
  // already exists — this cache models that.
  private val deriveCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def derive(spark: SparkSession, dir: String): DataFrame =
    deriveCache.computeIfAbsent((spark, dir), { _ =>
      deriveUncached(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Replace the cached transcripts for (spark, dir) — the bench uses
    * this to point every query at a parquet-materialized copy, so no
    * query can silently pay re-derivation (join+window) or block-manager
    * cache eviction inside its measured time.
    */
  def primeCache(spark: SparkSession, dir: String, df: DataFrame): Unit =
    deriveCache.put((spark, dir), df)

  /** Deterministic transcripts from driver testdata at `dir`.
    * turn_idx = row_number over the unique total order
    * (l_linenumber, l_partkey, l_suppkey) within each order — identically
    * computable in DuckDB, so every oracle can reconstruct row identity.
    * (The window shuffle is test-data *synthesis*, not engine work — at
    * production scale the transcripts table already exists.)
    */
  def deriveUncached(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // tiny dimension table; one cheap job

    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    li.join(broadcast(docs), pmod(col("l_orderkey"), lit(nDocs)) === col("doc_id"))
      .select(
        concat(lit("conv-"), col("l_orderkey")).as("conv_id"),
        row_number().over(w).as("turn_idx"),
        col("text").as("dtext"),
        col("l_orderkey").cast("string").as("okey"),
        col("l_linenumber").cast("string").as("lnum"),
        col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"),
        col("l_shipdate").cast("timestamp").as("ts")) // parquet reads ntz; input_hint wants timestamp
      .select(
        col("conv_id"),
        col("turn_idx"),
        expr("CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END").as("role"),
        expr(textSqlExpr).as("text"),
        expr("CASE WHEN turn_idx % 3 = 2 THEN 'browser' ELSE '' END").as("tool"),
        col("ts"))
  }

  /** DuckDB CTE regenerating the same transcripts (oracle-side input). */
  val OracleCte: String =
    """WITH t AS (
      |  SELECT 'conv-' || l_orderkey AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY l_orderkey
      |             ORDER BY l_linenumber, l_partkey, l_suppkey) AS INT) AS turn_idx,
      |         d.text AS dtext,
      |         CAST(l_orderkey AS VARCHAR) AS okey,
      |         CAST(l_linenumber AS VARCHAR) AS lnum,
      |         l_returnflag AS rf, l_linestatus AS ls
      |  FROM lineitem l
      |  JOIN documents d
      |    ON d.doc_id = l.l_orderkey % (SELECT count(*) FROM documents)
      |)""".stripMargin

  /** The turn's quirk-block as a DuckDB SQL expression (oracle side). */
  val OracleVariantExpr: String =
    """CASE turn_idx % 11
      | WHEN 1 THEN '<!-- note 11 -->'
      | WHEN 2 THEN '<br><hr><img src="/x.png">'
      | WHEN 3 THEN '<section><section>nested</section>'
      | WHEN 4 THEN '<span title=' || chr(39) || 'say "hi" now' || chr(39) || '>q</span>'
      | WHEN 5 THEN '<pre> a  b </pre>'
      | WHEN 6 THEN '< /q3>'
      | WHEN 7 THEN '<em id="z2" class="a1">x</em>'
      | WHEN 8 THEN '<ul><li>one</li><li>two</li></ul>'
      | WHEN 9 THEN '<input disabled type="text">'
      | WHEN 10 THEN '<table><tr><td>c1</td><td>c2</td></tr></table>'
      | ELSE '' END""".stripMargin.replace("\n", "")

  /** The quirk-block as it SURVIVES parse+toHtml: identical to
    * [[OracleVariantExpr]] except v6, whose stray endtag parseDOM drops
    * (Q18) — used by the roundtrip and remove_boilerplate oracles.
    */
  val OracleKeptVariantExpr: String =
    OracleVariantExpr.replace("WHEN 6 THEN '< /q3>'", "WHEN 6 THEN ''")

  private def textFromVariant(variantExpr: String): String =
    s"""'<html><head><title>conv</title><meta charset="utf-8"></head><body>'
      | || '<nav><a href="/home">Home</a> <a href="/about">About</a></nav>'
      | || '<div class="main" id="main"><h1>Conversation record</h1>'
      | || '<p>' || dtext || '</p>'
      | || '<p>order ' || okey || ' line ' || lnum || ' flag ' || rf || ' status ' || ls || '</p>'
      | || '<a href="/ord/' || okey || '/' || lnum || '">details</a></div>'
      | || '<footer><p>footer boilerplate text</p></footer>'
      | || ($variantExpr)
      | || '</body></html>'"""
      .stripMargin.replace("\n", "")

  /** The template rendered as a DuckDB SQL expression (oracle side). */
  val OracleTextExpr: String = textFromVariant(OracleVariantExpr)

  /** parse+toHtml of the template (= input except v6's dropped endtag). */
  val OracleRoundtripExpr: String = textFromVariant(OracleKeptVariantExpr)

  /** The extract_main expected output as a DuckDB SQL expression. */
  val OracleExtractExpr: String =
    """'Conversation record' || chr(10) || dtext || chr(10) ||
      | 'order ' || okey || ' line ' || lnum || ' flag ' || rf || ' status ' || ls"""
      .stripMargin.replace("\n", "")

  /** Read a transcripts parquet written with the Turn schema. */
  def read(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(path).as[Turn]
  }

  // ===== text source adapters (CSV / newline-delimited JSON) ==============
  //
  // Same Turn contract as the parquet path, for corpora that arrive as
  // text exports instead of columnar files. Two rules both adapters
  // enforce, because at 100 TB each is a silent correctness/throughput
  // cliff:
  //  - the schema is EXPLICIT (never inferSchema): inference is a whole
  //    extra pass over the input, and CSV inference can settle on
  //    different types per batch of files — a string turn_idx in one
  //    ingest and an int in the next corrupts every downstream join;
  //  - timestamps carry microseconds explicitly (Spark's default text
  //    timestamp format drops sub-millisecond precision, which would
  //    make a text round-trip silently non-identity).
  //
  // Splittability trade, documented not hidden: transcript text contains
  // NEWLINES, so CSV needs multiLine=true — and a multiLine CSV file is
  // NOT splittable (one task per file, however big). CSV input must
  // therefore arrive pre-sharded into many files (writeCsv inherits the
  // writer's partitioning for exactly this reason). ndjson has no such
  // problem — JSON escapes newlines inside string literals, each record
  // is one physical line, and the reader splits by line — so JSON is
  // the preferred text format; the CSV adapter exists for corpora that
  // already are CSV.

  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** The Turn schema as an explicit StructType (adapters never infer). */
  val turnSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Turn].schema

  private val csvOptions = Map(
    "header" -> "true",
    // RFC 4180 double-quote escaping — what external CSV producers emit
    "quote" -> "\"", "escape" -> "\"",
    "multiLine" -> "true",
    // Spark's default read nullValue is the EMPTY STRING, which would
    // silently fold ""-valued fields (e.g. tool on non-tool turns) into
    // null through the round trip — a distinct token keeps "" and null
    // distinguishable, as parquet does natively. The token is the
    // MySQL-dump null convention, and it is RESERVED: a field whose
    // literal value is the two-character string \N reads back as null
    // (quoting does not shield it — the parser matches nullValue after
    // unquoting). Corpora that can legitimately contain bare \N fields
    // should arrive as ndjson, which has a native null.
    "nullValue" -> "\\N",
    "timestampFormat" -> TsFormat)

  /** Turn columns in schema order: CSV with a user schema binds columns
    * by POSITION, so the writer must emit them in exactly this order. */
  private def turnCols(df: DataFrame): DataFrame =
    df.select(turnSchema.fieldNames.map(col).toIndexedSeq: _*)

  def writeCsv(df: DataFrame, path: String): Unit =
    turnCols(df).write.options(csvOptions).csv(path)

  def readCsv(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.schema(turnSchema).options(csvOptions).csv(path).as[Turn]
  }

  /** [[readCsv]] with the no-silent-drop contract extended to the
    * ingestion boundary: Spark's default PERMISSIVE mode turns a
    * malformed line into an all-null row with no trace — at corpus
    * scale malformed exports are a certainty, and silently nulled rows
    * corrupt every downstream count. This read carries the raw text of
    * every unparseable record in `corrupt_record` (null for good rows):
    * filter it off for the clean table, aggregate it for the audit —
    * the same observable-drop pattern as oversizeBuckets /
    * contaminationHotFingerprints.
    *
    * CALLER CONTRACT: persist (cache / localCheckpoint / write) the
    * returned frame BEFORE splitting on `corrupt_record` — Spark
    * forbids queries over the raw text scan that reference only the
    * internal corrupt-record column (a filtered count() prunes down to
    * exactly that and throws AnalysisException), and persisting also
    * guarantees the good/bad split reads one consistent parse pass.
    */
  def readCsvAudited(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(turnSchema.add("corrupt_record",
        org.apache.spark.sql.types.StringType))
      .options(csvOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "corrupt_record")
      .csv(path)

  /** The ndjson counterpart of [[readCsvAudited]] — the audited read
    * matters MOST here because these docs steer corpora toward ndjson:
    * a truncated line or a mis-typed field in PERMISSIVE mode would
    * otherwise become an untraceable all-null row. Same caller
    * contract: persist before splitting on `corrupt_record`.
    */
  def readJsonAudited(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(turnSchema.add("corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "corrupt_record")
      .json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    turnCols(df).write.option("timestampFormat", TsFormat).json(path)

  def readJson(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.schema(turnSchema)
      .option("timestampFormat", TsFormat).json(path).as[Turn]
  }
}

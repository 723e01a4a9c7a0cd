package graft.parser

import scala.collection.mutable.ArrayBuffer

/** Tokenizer reproducing the reference's `rawSplit` 4-state character
  * machine (/root/reference/dhtmlparser.d:758-836): splits HTML text into
  * alternating content / tag / comment substrings.
  *
  * States: 0 = content, 1 = inside tag, 2 = quoted string inside tag,
  * 3 = comment. A 4-char lookbehind ring buffer drives comment open/close
  * detection and backslash-escaped quote closing (quirks Q9-Q11 in
  * SURVEY.md §2.5).
  *
  * D iterates UTF-8 bytes; we iterate UTF-16 code units. All state
  * transitions trigger on ASCII chars ( < > ' " - ! \ ), and neither UTF-8
  * continuation bytes nor UTF-16 surrogates collide with ASCII, so the
  * produced token boundaries are identical for any valid input.
  */
object Lexer {

  /** Split `itxt` into raw tokens. Also returns, aligned with the tokens,
    * the start offset of each token in `itxt` (used for span lineage;
    * offsets are an addition of ours, invisible to reference semantics).
    */
  // Reusable per-thread token builder ("batched tokenize with reusable
  // parser state", BASELINE.json north_star): Spark tasks are
  // single-threaded per partition, so one scratch buffer per thread is
  // reused across every row of the partition.
  private val tlContent: ThreadLocal[java.lang.StringBuilder] =
    ThreadLocal.withInitial(() => new java.lang.StringBuilder(256))

  def rawSplitWithOffsets(itxt: String): (ArrayBuffer[String], ArrayBuffer[Int]) = {
    // D `char[4] buff` inits to 0xFF; 0xFF matches none of the guards.
    val buff = Array.fill[Char](4)(0xFF.toChar)
    var echr: Char = 0
    val content = tlContent.get()
    content.setLength(0)
    var contentStart = 0
    val out = new ArrayBuffer[String]()
    val offs = new ArrayBuffer[Int]()
    var state = 0
    var insideTag = false

    def push(tok: String, start: Int): Unit = { out += tok; offs += start }

    var i = 0
    val n = itxt.length
    while (i < n) {
      val c = itxt.charAt(i)
      (state: @annotation.switch) match {
        case 0 => // content (dhtmlparser.d:768-778)
          if (c == '<') {
            if (content.length > 0) push(content.toString, contentStart)
            content.setLength(0); content.append(c); contentStart = i
            state = 1
            insideTag = false
          } else {
            if (content.length == 0) contentStart = i
            content.append(c)
          }

        case 1 => // html tag (dhtmlparser.d:779-800)
          if (c == '>') {
            content.append(c)
            push(content.toString, contentStart)
            content.setLength(0)
            state = 0
          } else if (c == '\'' || c == '"') {
            echr = c
            content.append(c)
            state = 2
          } else if (c == '-' && buff(0) == '-' && buff(1) == '!' && buff(2) == '<') {
            // saw "<!--": content ends with "<!-"; split off the prefix
            // before it (dhtmlparser.d:788-792)
            val len = content.length
            if (len - 3 > 0) push(content.substring(0, len - 3), contentStart)
            val tail = content.substring(len - 3)
            contentStart = contentStart + len - 3
            content.setLength(0)
            content.append(tail).append(c)
            state = 3
          } else {
            if (c == '<') insideTag = true // (dhtmlparser.d:794-796)
            content.append(c)
          }

        case 2 => // quoted string inside tag (dhtmlparser.d:801-807)
          if (c == echr && (buff(0) != '\\' || (buff(0) == '\\' && buff(1) == '\\')))
            state = 1
          content.append(c)

        case 3 => // html comment (dhtmlparser.d:808-821)
          if (c == '>' && buff(0) == '-' && buff(1) == '-') {
            state = if (insideTag) 1 else 0
            insideTag = false
            content.append(c)
            push(content.toString, contentStart)
            content.setLength(0)
            contentStart = i + 1
          } else content.append(c)
      }

      // rotate lookbehind buffer (dhtmlparser.d:826-828)
      buff(3) = buff(2); buff(2) = buff(1); buff(1) = buff(0); buff(0) = c
      i += 1
    }

    if (content.length > 0) push(content.toString, contentStart) // flush (dhtmlparser.d:832-833)
    (out, offs)
  }

  def rawSplit(itxt: String): ArrayBuffer[String] = rawSplitWithOffsets(itxt)._1
}

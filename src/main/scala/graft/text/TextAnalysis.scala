package graft.text

/** Deterministic text-analysis primitives for training-data pipelines
  * (language-ID, quality scoring, token counting). Pure functions —
  * called row-wise from Spark (mapPartitions / codegen'd functions where
  * expressible) and unit-testable without a SparkSession.
  */
object TextAnalysis {

  // ===== tokenization ======================================================

  /** Whitespace token count (single pass, no allocation). */
  def wsTokenCount(s: String): Int = {
    var count = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      val w = Character.isWhitespace(s.charAt(i))
      if (!w && !inTok) { count += 1; inTok = true }
      else if (w) inTok = false
      i += 1
    }
    count
  }

  /** Whitespace token count DIRECTLY over UTF-8 bytes (no String decode
    * or allocation — the form called from generated code by the
    * [[graft.spark.catalyst.WsTokenCount]] Catalyst expression). ASCII
    * bytes take the 1-byte fast path; multi-byte sequences decode just
    * the code point (Unicode whitespace like U+2028 must count — and
    * U+00A0 must NOT — exactly as [[wsTokenCount]] does on chars; the
    * equivalence is property-tested).
    */
  def wsTokenCountUtf8(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val n = s.numBytes
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      var cp: Int = b
      var len = 1
      if (b < 0) {
        len = org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b)
        cp = b & (if (len == 2) 0x1F else if (len == 3) 0x0F else 0x07)
        var k = 1
        while (k < len && i + k < n) {
          cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
          k += 1
        }
      }
      val w = Character.isWhitespace(cp)
      if (!w && !inTok) { count += 1; inTok = true }
      else if (w) inTok = false
      i += len
    }
    count
  }

  /** BPE-ish subword-boundary token count: alnum runs split at
    * case/digit transitions, plus each punctuation char. Approximates a
    * byte-pair tokenizer's granularity deterministically (a stand-in for
    * a real vocab; same shape as GPT-style pretokenizers).
    */
  def bpeishTokenCount(s: String): Int = {
    var count = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (Character.isLetter(c)) {
        // a letter run; split every 6 chars (subword pieces) and at case flips
        var j = i + 1
        var pieces = 1
        var run = 1
        while (j < n && Character.isLetter(s.charAt(j))) {
          val prevUp = Character.isUpperCase(s.charAt(j - 1))
          val curUp = Character.isUpperCase(s.charAt(j))
          run += 1
          if ((curUp && !prevUp) || run > 6) { pieces += 1; run = 1 }
          j += 1
        }
        count += pieces
        i = j
      } else if (Character.isDigit(c)) {
        // digit runs: one token per 3 digits (number chunking)
        var j = i + 1
        while (j < n && Character.isDigit(s.charAt(j))) j += 1
        count += (j - i + 2) / 3
        i = j
      } else { count += 1; i += 1 } // punctuation / symbol: one each
    }
    count
  }

  /** [[bpeishTokenCount]] DIRECTLY over UTF-8 bytes (no String decode —
    * the form called from generated code by the
    * [[graft.spark.catalyst.BpeishTokenCount]] Catalyst expression).
    * Char-level parity with the String form is deliberate: supplementary-
    * plane code points count as TWO symbol chars (the String version sees
    * two surrogates, neither a letter), so the equivalence property holds
    * on arbitrary Unicode.
    */
  def bpeishTokenCountUtf8(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val n = s.numBytes
    var count = 0
    var i = 0
    var cp = 0
    var cpLen = 1
    def decode(at: Int): Unit = {
      val b = s.getByte(at)
      cp = b; cpLen = 1
      if (b < 0) {
        cpLen = org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b)
        cp = b & (if (cpLen == 2) 0x1F else if (cpLen == 3) 0x0F else 0x07)
        var k = 1
        while (k < cpLen && at + k < n) {
          cp = (cp << 6) | (s.getByte(at + k) & 0x3F)
          k += 1
        }
      }
    }
    while (i < n) {
      decode(i)
      if (cp > 0xFFFF) { count += 2; i += cpLen } // two surrogate symbol chars
      else if (Character.isWhitespace(cp)) i += cpLen
      else if (Character.isLetter(cp)) {
        var pieces = 1
        var run = 1
        var prevUp = Character.isUpperCase(cp)
        i += cpLen
        var done = false
        while (i < n && !done) {
          decode(i)
          if (cp > 0xFFFF || !Character.isLetter(cp)) done = true
          else {
            val curUp = Character.isUpperCase(cp)
            run += 1
            if ((curUp && !prevUp) || run > 6) { pieces += 1; run = 1 }
            prevUp = curUp
            i += cpLen
          }
        }
        count += pieces
      } else if (Character.isDigit(cp)) {
        var d = 1
        i += cpLen
        var done = false
        while (i < n && !done) {
          decode(i)
          if (cp > 0xFFFF || !Character.isDigit(cp)) done = true
          else { d += 1; i += cpLen }
        }
        count += (d + 2) / 3
      } else { count += 1; i += cpLen }
    }
    count
  }

  // ===== language ID =======================================================

  private val Stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu", "auf", "für"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "es", "no", "por", "con", "para"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "est", "pas", "que", "pour", "dans")
  )

  /** Heuristic language ID: script ranges first (CJK -> zh, Cyrillic ->
    * ru, Devanagari -> hi), then stopword voting over latin text;
    * "und" (undetermined) when nothing scores. Returns (lang, confidence).
    */
  def detectLanguage(s: String): (String, Double) = {
    var cjk = 0; var cyr = 0; var deva = 0; var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
        else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
        else if (c >= 0x0900 && c <= 0x097F) deva += 1
      }
      i += 1
    }
    if (letters == 0) return ("und", 0.0)
    if (cjk * 2 > letters) return ("zh", cjk.toDouble / letters)
    if (cyr * 2 > letters) return ("ru", cyr.toDouble / letters)
    if (deva * 2 > letters) return ("hi", deva.toDouble / letters)

    val words = s.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.isEmpty) return ("und", 0.0)
    var best = "und"; var bestHits = 0
    Stopwords.toSeq.sortBy(_._1).foreach { case (lang, sw) =>
      val hits = words.count(sw.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    if (bestHits == 0) ("und", 0.0)
    else (best, bestHits.toDouble / words.length)
  }

  // ===== quality scoring ===================================================

  final case class Quality(nChars: Int, nTokens: Int, meanTokenLen: Double,
                           alphaRatio: Double, punctRatio: Double,
                           stopwordRatio: Double, score: Double)

  /** Deterministic document-quality signals (C4/Gopher-style filters from
    * the public literature): length, alpha/punct ratios, mean token
    * length, English stopword ratio, folded into one [0,1] score.
    */
  def quality(s: String): Quality = {
    var alpha = 0; var punct = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) alpha += 1
      else if (!Character.isWhitespace(c)) punct += 1
      i += 1
    }
    val n = s.length
    val toks = s.split("\\s+").filter(_.nonEmpty)
    val nTok = toks.length
    val meanLen = if (nTok == 0) 0.0 else toks.map(_.length).sum.toDouble / nTok
    val aR = if (n == 0) 0.0 else alpha.toDouble / n
    val pR = if (n == 0) 0.0 else punct.toDouble / n
    val sw = Stopwords("en")
    val swR = if (nTok == 0) 0.0 else toks.count(t => sw.contains(t.toLowerCase)).toDouble / nTok

    // each clause in [0,1]; fixed weights
    val lenScore = math.min(1.0, n / 500.0)
    val meanLenScore = if (meanLen >= 3 && meanLen <= 10) 1.0 else 0.5
    val alphaScore = aR
    val punctScore = math.max(0.0, 1.0 - 4.0 * pR)
    val swScore = math.min(1.0, swR * 5.0)
    val score = 0.25 * lenScore + 0.15 * meanLenScore + 0.25 * alphaScore +
      0.15 * punctScore + 0.20 * swScore
    Quality(n, nTok, meanLen, aR, pR, swR, score)
  }
}

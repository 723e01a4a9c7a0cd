package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic hashing / sketching primitives for dedup at scale:
  * 64-bit mixing (splitmix64), char-shingle set hashing, MinHash
  * signatures + LSH band keys, SimHash, and winnowing fingerprints.
  * All public-literature algorithms (Broder '97 minhash; Charikar '02
  * simhash; Schleimer et al. '03 winnowing); fixed seeds => identical
  * output on any cluster size.
  */
object Fingerprints {

  /** splitmix64 finalizer — the standard 64-bit mixer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a char range (no allocation). */
  def fnv64(s: String, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  def fnv64(s: String): Long = fnv64(s, 0, s.length)

  /** Distinct hashes of all k-char shingles (sorted for determinism). */
  def charShingles(s: String, k: Int = 5): Array[Long] = {
    if (s.length < k) return Array(fnv64(s))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= s.length) {
      set.add(fnv64(s, i, i + k))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Word n-gram shingle hashes (for n-gram Jaccard dedup). */
  def wordShingles(s: String, n: Int = 3): Array[Long] = {
    val words = s.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return Array(fnv64(words.mkString(" ")))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= words.length) {
      var h = 0xCBF29CE484222325L
      var j = i
      while (j < i + n) {
        val w = words(j)
        var c = 0
        while (c < w.length) { h ^= w.charAt(c).toLong; h *= 0x100000001B3L; c += 1 }
        h ^= ' '.toLong; h *= 0x100000001B3L
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Exact Jaccard of two sorted hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val inter = intersectionCount(a, b)
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Sorted-distinct merge intersection size — the one audited home of
    * the two-pointer walk (jaccard above and the integer-count verify
    * tier both use it; inputs MUST be sorted and duplicate-free, as
    * every shingle producer here guarantees). */
  def intersectionCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter
  }

  /** MinHash signature: numPerms permutations h_i(x) = mix64(x + seed_i),
    * min over the shingle set. One pass over shingles per permutation
    * batch (cache-friendly loop order: shingles outer).
    */
  def minHash(shingles: Array[Long], numPerms: Int = 64): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = shingles(i)
      var p = 0
      while (p < numPerms) {
        val h = mix64(x + Seeds(p))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  private val Seeds: Array[Long] = {
    val a = new Array[Long](256)
    var s = 0x5A17BEEFCAFEL
    var i = 0
    while (i < a.length) { s = mix64(s); a(i) = s; i += 1 }
    a
  }

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * rows = numPerms/bands consecutive signature entries. Two docs share
    * a band key with prob 1-(1-J^rows)^bands.
    */
  def lshBands(sig: Array[Long], bands: Int = 16): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xCBF29CE484222325L ^ b
      var r = b * rows
      while (r < (b + 1) * rows) {
        h ^= sig(r)
        h *= 0x100000001B3L
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Estimated Jaccard from two minhash signatures. */
  def minHashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** 64-bit SimHash over word hashes (Charikar). */
  def simHash(s: String): Long = {
    val counts = new Array[Int](64)
    val words = s.split("\\s+")
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val h = fnv64(words(w))
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      w += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** [[simHash]] DIRECTLY over UTF-8 bytes — the form called from
    * generated code by the [[graft.spark.catalyst.SimHash64]] Catalyst
    * expression. Bit-identical to the String form: word boundaries are
    * Java-regex `\s` (ASCII whitespace ONLY — U+00A0/U+2028 are word
    * chars, exactly as `split("\\s+")` treats them), and each word's
    * FNV-1a folds UTF-16 code units (supplementary code points fold as a
    * surrogate pair), matching fnv64-over-chars.
    */
  def simHashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val counts = new Array[Int](64)
    val n = s.numBytes
    var i = 0
    var h = 0xCBF29CE484222325L
    var inWord = false
    def flush(): Unit = {
      if (inWord) {
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
        h = 0xCBF29CE484222325L
        inWord = false
      }
    }
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
      // Java regex \s: [ \t\n\x0B\f\r]
      val ws = cp == 0x20 || (cp >= 0x09 && cp <= 0x0D)
      if (ws) flush()
      else {
        inWord = true
        if (cp > 0xFFFF) {
          val off = cp - 0x10000
          h ^= (0xD800 + (off >> 10)).toLong;  h *= 0x100000001B3L
          h ^= (0xDC00 + (off & 0x3FF)).toLong; h *= 0x100000001B3L
        } else {
          h ^= cp.toLong; h *= 0x100000001B3L
        }
      }
      i += len
    }
    flush()
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing document fingerprints: k-gram rolling hashes, min per
    * window of size w (rightmost min on ties), deduplicated, sorted.
    */
  def winnow(s: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (s.length < k) return Array(fnv64(s))
    val nGrams = s.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hashes(i) = fnv64(s, i, i + k); i += 1 }
    val picked = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= nGrams) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      picked.add(hashes(minIdx))
      start += 1
    }
    if (picked.isEmpty) picked.add(hashes(0))
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    out
  }

  // ===== embeddings ========================================================

  /** Cosine similarity between two float vectors. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  // Precomputed plane matrices keyed by (nbits, dim): rhpBucket is called
  // once per corpus row, and recomputing mix64 per (bit x dim) per row was
  // measurably wasteful (VERDICT r1 item 10). Values are identical to the
  // on-the-fly formula (same Seeds), so buckets are unchanged.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Deterministic hyperplanes for table `table`: table 0 reproduces the
    * pre-multi-table planes bit-for-bit (seed index t*nbits+b == b), so
    * existing single-table buckets are unchanged; higher tables draw
    * from disjoint seed ranges — the independent hash tables classic
    * multi-table LSH needs for recall amplification.
    */
  private[text] def rhpPlanes(nbits: Int, dim: Int, table: Int = 0): Array[Array[Double]] = {
    // the seed pool is finite: seed index table*nbits+b must not wrap, or
    // a high table id would silently REUSE a lower table's plane set
    // (e.g. nbits=16 table=16 == table 0) and the extra table would add
    // zero recall. Fail loudly instead of aliasing (ADVICE r4).
    require(table >= 0 && table * nbits + nbits <= Seeds.length,
      s"RHP table $table with nbits=$nbits exceeds the ${Seeds.length}-seed pool " +
        s"(would alias an earlier table's planes); max table is ${Seeds.length / nbits - 1}")
    planeCache.computeIfAbsent((nbits, dim, table), { _ =>
      Array.tabulate(nbits, dim) { (b, i) =>
        // deterministic plane component in [-1,1): mix of (table, bit, dim)
        mix64(Seeds(table * nbits + b) + i).toDouble / Long.MaxValue.toDouble
      }
    })
  }

  /** Random-hyperplane LSH bucket (sign bits of dot products with
    * deterministic pseudo-random planes) for embedding near-dup/ANN
    * bucketing: `nbits` sign bits packed into a Long. `table` selects an
    * independent plane set (multi-table LSH); the default table 0 is
    * bit-identical to the pre-table behavior.
    */
  def rhpBucket(v: Array[Float], nbits: Int = 16, table: Int = 0): Long = {
    val planes = rhpPlanes(nbits, v.length, table)
    var out = 0L
    var b = 0
    while (b < nbits) {
      val plane = planes(b)
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        dot += v(i) * plane(i)
        i += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

package graft.spark

/** Bounded sorted-buffer primitives shared by the top-k Aggregators
  * ([[TopKBySim]] uses insert+mergeSorted; [[Pipeline.FirstKTurns]]
  * keeps its own char-budget-aware insert but shares mergeSorted).
  *
  * `insert` costs O(log k) comparisons + one O(k) copy per ACCEPTED row
  * (rows that can't enter a full buffer are rejected in O(1)), replacing
  * the per-row sort-and-take pattern whose O(k log k) sort made a
  * monster group cost the reducer O(n * k log k) at the default k=10000
  * (VERDICT r2 item 4). Memory stays bounded at k entries either way —
  * this fixes the CPU term only.
  */
object BoundedSortedBuf {

  /** Insert `e` into ascending-sorted `buf`, keeping at most `k` smallest
    * entries. Equal elements insert AFTER existing ones (stable, matching
    * the previous stable sortBy semantics).
    */
  def insert[T](buf: Seq[T], e: T, k: Int)(implicit ord: Ordering[T]): Seq[T] = {
    if (k <= 0) return buf // k<=0 admits nothing (buf.last would throw on empty buf)
    if (buf.length >= k && ord.gteq(e, buf.last)) return buf
    val v: IndexedSeq[T] = buf match {
      case is: IndexedSeq[T] => is
      case other             => other.toIndexedSeq
    }
    var lo = 0
    var hi = v.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (ord.lteq(v(m), e)) lo = m + 1 else hi = m
    }
    val out = v.patch(lo, e :: Nil, 0)
    if (out.length > k) out.dropRight(1) else out
  }

  /** Merge two ascending-sorted buffers, keeping the k smallest —
    * linear two-pointer merge (no re-sort of the concatenation).
    */
  def mergeSorted[T](a: Seq[T], b: Seq[T], k: Int)(implicit ord: Ordering[T]): Seq[T] = {
    val ia = a.iterator.buffered
    val ib = b.iterator.buffered
    val out = Vector.newBuilder[T]
    var n = 0
    while (n < k && (ia.hasNext || ib.hasNext)) {
      val takeA = ia.hasNext && (!ib.hasNext || ord.lteq(ia.head, ib.head))
      out += (if (takeA) ia.next() else ib.next())
      n += 1
    }
    out.result()
  }
}

package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** BoundedSortedBuf == sort-and-take semantics (the pattern it replaced),
  * for every interleaving of inserts and merges.
  */
class BoundedSortedBufSpec extends AnyFunSuite {

  test("insert equals sorted.take(k) over random streams (stable on ties)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val k = 1 + rnd.nextInt(8)
      val xs = Vector.fill(rnd.nextInt(40))((rnd.nextInt(10), rnd.nextInt(1000)))
      val got = xs.foldLeft(Seq.empty[(Int, Int)])(
        (b, e) => BoundedSortedBuf.insert(b, e, k)(Ordering.by(_._1)))
      val want = xs.sortBy(_._1).take(k)
      assert(got == want, s"k=$k xs=$xs")
    }
  }

  test("mergeSorted equals concat-sort-take over random sorted buffers") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val k = 1 + rnd.nextInt(8)
      val a = Vector.fill(rnd.nextInt(12))(rnd.nextInt(100)).sorted
      val b = Vector.fill(rnd.nextInt(12))(rnd.nextInt(100)).sorted
      val got = BoundedSortedBuf.mergeSorted(a, b, k)
      assert(got == (a ++ b).sorted.take(k), s"k=$k a=$a b=$b")
    }
  }

  test("full-buffer reject path leaves the buffer untouched (same reference)") {
    val buf = BoundedSortedBuf.insert(
      BoundedSortedBuf.insert(Seq.empty[Int], 1, 2), 2, 2)
    assert(BoundedSortedBuf.insert(buf, 5, 2) eq buf)
  }

  test("FirstKTurns char budget == sorted-prefix semantics for every arrival order/partitioning") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 300) {
      val k = 1 + rnd.nextInt(6)
      val maxChars = 1L + rnd.nextInt(40)
      val turns = Vector.tabulate(rnd.nextInt(14))(i => (i, "x" * rnd.nextInt(16)))
      // ground truth: longest idx-ordered prefix within both caps
      var cum = 0L
      val want = turns.takeWhile { case (i, s) =>
        val ok = i < k && cum + s.length <= maxChars; if (ok) cum += s.length; ok
      }
      val agg = new Pipeline.FirstKTurns(k, maxChars)
      // random arrival order, random partitioning, random merge order
      val shuffled = rnd.shuffle(turns)
      val nParts = 1 + rnd.nextInt(4)
      val partials = shuffled.grouped(math.max(1, shuffled.size / nParts + 1))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toVector
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == want,
        s"trial=$trial k=$k max=$maxChars turns=${turns.map(_._2.length)}")
    }
  }

  test("k <= 0 admits nothing and never throws (ADVICE r3)") {
    assert(BoundedSortedBuf.insert(Seq.empty[Int], 1, 0) == Seq.empty)
    assert(BoundedSortedBuf.insert(Seq.empty[Int], 1, -3) == Seq.empty)
    assert(BoundedSortedBuf.mergeSorted(Seq.empty[Int], Seq.empty[Int], 0) == Seq.empty)
    // and the consuming aggregators fail fast at construction instead
    intercept[IllegalArgumentException](new Pipeline.FirstKTurns(0))
    intercept[IllegalArgumentException](new TopKBySim(0))
  }
}

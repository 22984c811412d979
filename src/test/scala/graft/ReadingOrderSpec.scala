package graft

import graft.core._
import graft.core.ReadingOrder.Box
import org.scalatest.funsuite.AnyFunSuite

/** Reading-order partial order + topsort (psegutils.py:114-170 port) and
  * the predominant-language fallback chain (div/lang.py:24-88 port).
  */
class ReadingOrderSpec extends AnyFunSuite {

  test("two-column layout orders column-wise (left column first)") {
    // col A: x 0-40, three lines; col B: x 60-100, three lines
    val boxes = IndexedSeq(
      Box(0, 1, 60, 100), Box(1, 2, 60, 100), Box(2, 3, 60, 100), // B0 B1 B2
      Box(0, 1, 0, 40), Box(1, 2, 0, 40), Box(2, 3, 0, 40)) // A0 A1 A2
    val sorted = ReadingOrder.topsort(ReadingOrder.order(boxes))
    assert(sorted == Seq(3, 4, 5, 0, 1, 2), s"got $sorted")
  }

  test("a vertical separator suppresses the cross-column edge") {
    val boxes = IndexedSeq(
      Box(0, 1, 60, 100), // B0
      Box(0, 1, 0, 40), // A0
      Box(0, 1, 35, 65)) // separator reaching into both (psegutils.py:128-130:
    // it must start before u's stop and stop after v's start to count)
    val o = ReadingOrder.order(boxes)
    // without the separator A0 would precede B0 via left_of; with it the
    // pair stays unordered
    assert(!o(1)(0))
    // a strictly-between gap box does NOT separate (reference quirk)
    val gap = IndexedSeq(Box(0, 1, 60, 100), Box(0, 1, 0, 40), Box(0, 1, 45, 55))
    assert(ReadingOrder.order(gap)(1)(0))
  }

  test("single-column stacked lines sort top-down") {
    val boxes = IndexedSeq(Box(2, 3, 0, 100), Box(0, 1, 0, 100), Box(1, 2, 0, 100))
    assert(ReadingOrder.topsort(ReadingOrder.order(boxes)) == Seq(1, 2, 0))
  }

  test("DOM blocks are the single-column degenerate case: identity order") {
    val blocks = HtmlBlocks.segment(graft.fixtures.PagesGen.page(2L).row.html)
    assert(ReadingOrder.sort(blocks) == blocks)
  }

  /** The naive O(n^3) pair loop exactly as psegutils.py:114-135 writes it —
    * the reference implementation the production `order` must match
    * bit-for-bit (it restructures the separator scan for speed).
    */
  private def naiveOrder(boxes: IndexedSeq[Box]): Array[Array[Boolean]] = {
    val n = boxes.length
    val o = Array.ofDim[Boolean](n, n)
    for (i <- 0 until n; j <- 0 until n) {
      val u = boxes(i); val v = boxes(j)
      if (ReadingOrder.xOverlaps(u, v)) {
        if (ReadingOrder.above(u, v)) o(i)(j) = true
      } else if (!boxes.exists(w => ReadingOrder.separates(w, u, v))) {
        if (ReadingOrder.leftOf(u, v)) o(i)(j) = true
      }
    }
    o
  }

  test("restructured order() is bit-identical to the naive triple loop (fuzz)") {
    val rng = new scala.util.Random(7)
    (1 to 40).foreach { _ =>
      val n = 1 + rng.nextInt(25)
      val boxes = IndexedSeq.fill(n) {
        val y0 = rng.nextInt(50).toDouble; val x0 = rng.nextInt(120).toDouble
        // mix of normal boxes, tall separators, wide bands, zero-width slivers
        Box(y0, y0 + 1 + rng.nextInt(30), x0, x0 + rng.nextInt(60))
      }
      val fast = ReadingOrder.order(boxes)
      val slow = naiveOrder(boxes)
      assert(fast.map(_.toSeq).toSeq == slow.map(_.toSeq).toSeq,
        s"order mismatch on $boxes")
    }
  }

  test("pathological 2k-box page finishes in bounded time (VERDICT r4 #7)") {
    // 2 columns x 1000 rows: 1M+ non-overlapping pairs, each of which
    // used to pay an O(n) separator scan (~8e9 separates calls, tens of
    // seconds); the candidate-prefilter + x1-desc early exit makes every
    // scan O(1) here. Generous wall bound — an O(n^3) regression is two
    // orders of magnitude over it.
    val boxes = (0 until 1000).flatMap { r =>
      Seq(Box(r, r + 0.8, 0, 40), Box(r, r + 0.8, 60, 100))
    }.toIndexedSeq
    val t0 = System.nanoTime()
    val sorted = ReadingOrder.topsort(ReadingOrder.order(boxes))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sorted.length == 2000)
    // left column fully precedes right column; rows stay top-down
    assert(sorted.take(3) == Seq(0, 2, 4) && sorted(1000) == 1, s"got ${sorted.take(5)}")
    assert(sec < 10.0, f"order+topsort took $sec%.1f s on 2000 boxes")
  }
}

class LangStatsSpec extends AnyFunSuite {

  test("line-level argmax wins when every line is annotated") {
    assert(LangStats.predominantLanguage(
      Seq(Some("de"), Some("en"), Some("de")), Seq(Some("en"))) == "de")
  }

  test("first-seen max wins ties (Python dict insertion order)") {
    assert(LangStats.predominantLanguage(
      Seq(Some("en"), Some("de"), Some("de"), Some("en")), Nil) == "en")
  }

  test("one un-annotated line poisons the level -> word fallback") {
    // lang.py's max over a dict with a None key raises TypeError, which
    // triggers the word-level fallback
    assert(LangStats.predominantLanguage(
      Seq(Some("de"), None, Some("de")), Seq(Some("en"), Some("en"))) == "en")
  }

  test("both levels unusable -> fixed defaults") {
    assert(LangStats.predominantLanguage(Seq(None), Seq.empty) == "German")
    assert(LangStats.predominantFont(Seq.empty, Seq(None)) == "Antiqua")
  }
}

class XYCutSpec extends AnyFunSuite {
  test("two columns separated by a wide gap cut into two regions, left first") {
    val boxes = IndexedSeq(
      Box(0, 1, 60, 100), Box(2, 3, 60, 100), // right column
      Box(0, 1, 0, 40), Box(2, 3, 0, 40)) // left column
    val r = ReadingOrder.xyCut(boxes, minGap = 5)
    // left column = region 0, right = region 1
    assert(r == IndexedSeq(1, 1, 0, 0), s"got $r")
  }

  test("horizontal band gap cuts before vertical (top section first)") {
    val boxes = IndexedSeq(
      Box(0, 1, 0, 100), // header band
      Box(10, 11, 0, 40), Box(10, 11, 60, 100)) // two columns below
    val r = ReadingOrder.xyCut(boxes, minGap = 5)
    assert(r(0) == 0) // header is its own region, first
    assert(r(1) == 1 && r(2) == 2) // columns split left-to-right below
  }

  test("no gaps -> one region") {
    val boxes = IndexedSeq(Box(0, 2, 0, 50), Box(1, 3, 40, 100))
    assert(ReadingOrder.xyCut(boxes, minGap = 5).distinct == IndexedSeq(0))
  }

  test("recursion terminates on nested structure and numbers reading order") {
    // 2x2 grid with wide gaps both ways
    val boxes = IndexedSeq(
      Box(20, 21, 60, 100), // bottom-right
      Box(0, 1, 0, 40), // top-left
      Box(20, 21, 0, 40), // bottom-left
      Box(0, 1, 60, 100)) // top-right
    val r = ReadingOrder.xyCut(boxes, minGap = 5)
    // horizontal cut first: top {TL=0, TR=1}, bottom {BL=2, BR=3}
    assert(r == IndexedSeq(3, 0, 2, 1), s"got $r")
  }

  test("table cells: flat topsort is column-major, xyCut-then-order is row-major") {
    // 2x2 table grid: rows y-gapped, cells within a row TOUCHING in x —
    // the segment.py table-cell role. Boxes in column-major DOM order.
    val boxes = IndexedSeq(
      Box(0, 30, 0, 100), // r0c0
      Box(40, 70, 0, 100), // r1c0
      Box(0, 30, 100, 200), // r0c1
      Box(40, 70, 100, 200)) // r1c1
    // the FLAT composition (q49's) gives column-major on a table: every
    // left-column cell precedes every right-column cell via leftOf
    val flat = ReadingOrder.topsort(ReadingOrder.order(boxes))
    assert(flat == Seq(0, 1, 2, 3), s"got $flat") // c0 fully before c1: WRONG for tables
    // the hierarchical composition: xyCut isolates rows (x cannot cut
    // touching cells), order/topsort sequences left-to-right within a row
    val region = ReadingOrder.xyCut(boxes)
    assert(region == IndexedSeq(0, 1, 0, 1), s"got $region")
    val ordered = boxes.indices.groupBy(region).toSeq.sortBy(_._1)
      .flatMap { case (_, idx) =>
        val sub = idx.toIndexedSeq
        ReadingOrder.topsort(ReadingOrder.order(sub.map(boxes))).map(sub)
      }
    assert(ordered == Seq(0, 2, 1, 3), s"got $ordered") // row-major
  }
}

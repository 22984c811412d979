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

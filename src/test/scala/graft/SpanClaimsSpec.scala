package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** clip/resegment span-claim arbitration (clip.py:44-267,
  * resegment.py:57-520 re-bound to 1-D byte spans).
  */
class SpanClaimsSpec extends AnyFunSuite {

  private def blk(id: String, s: Long, e: Long) =
    Block(id, "text", Span(s, e), "", 0.0, 0.0)

  test("clip awards the contested region to the majority claimant") {
    // a=[0,100), b=[90,110): inter=10; 10/100 < 10/20 -> b's claim wins,
    // a is clipped back to b's start
    val out = SpanClaims.clip(Seq(blk("a", 0, 100), blk("b", 90, 110)))
    assert(out.map(b => (b.id, b.span.start, b.span.stop)) ==
      Seq(("a", 0L, 90L), ("b", 90L, 110L)))
    // symmetric: big b loses to small a
    val out2 = SpanClaims.clip(Seq(blk("a", 0, 20), blk("b", 10, 120)))
    assert(out2.map(b => (b.id, b.span.start, b.span.stop)) ==
      Seq(("a", 0L, 20L), ("b", 20L, 120L)))
  }

  test("clip drops blocks consumed entirely by a stronger neighbour") {
    // b fully inside a and tiny -> b's share is 100%, a's small: b keeps
    // its region, a's tail is clipped to b.start; then b survives
    val out = SpanClaims.clip(Seq(blk("a", 0, 100), blk("b", 40, 42)))
    assert(out.map(_.id) == Seq("a", "b"))
    assert(out.forall(b => b.span.stop > b.span.start))
    // a zero-claim survivor case: equal spans -> first (by id) wins, the
    // other clips to empty and is dropped
    val eq = SpanClaims.clip(Seq(blk("a", 5, 9), blk("b", 5, 9)))
    assert(eq.map(_.id) == Seq("a"))
  }

  test("clip output is always pairwise disjoint (seeded property loop)") {
    val rng = new java.util.Random(7L)
    (1 to 300).foreach { _ =>
      val spans = Seq.fill(6) {
        val s = rng.nextInt(200).toLong; val l = 1L + rng.nextInt(60)
        (s, s + l)
      }
      val blocks = spans.zipWithIndex.map { case ((s, e), i) => blk(f"b$i%02d", s, e) }
      val out = SpanClaims.clip(blocks)
      out.sliding(2).foreach {
        case Seq(x, y) => assert(x.span.stop <= y.span.start,
          s"overlap after clip: $x $y from $spans")
        case _ =>
      }
    }
  }

  test("resegment assigns candidates by majority overlap and re-outlines") {
    val existing = Seq(Span(0, 50), Span(60, 100))
    // c1 mostly in line 0; c2 mostly in line 1; c3 fits nothing
    val candidates = Seq(Span(5, 45), Span(40, 48), Span(58, 95), Span(200, 220))
    val out = SpanClaims.resegment(existing, candidates)
    assert(out(0) == Span(5, 48)) // hull of c1+c2
    assert(out(1) == Span(58, 95))
  }

  test("resegment subtracts earlier outlines from later overlapping lines") {
    val existing = Seq(Span(0, 50), Span(45, 100))
    val candidates = Seq(Span(0, 60), Span(50, 90))
    val out = SpanClaims.resegment(existing, candidates)
    // line 0 hull [0,60); line 1 hull [50,90) overlaps -> clipped to [60,90)
    assert(out == Seq(Span(0, 60), Span(60, 90)))
  }

  test("resegment keeps lines with no assigned candidates") {
    val out = SpanClaims.resegment(Seq(Span(0, 10), Span(20, 30)), Seq(Span(1, 9)))
    // line 0 is re-outlined to its assigned candidate's hull; line 1 kept
    assert(out == Seq(Span(1, 9), Span(20, 30)))
  }

  test("clip resolves the sloppy segmenter's overlaps back to disjoint spans") {
    val p = graft.fixtures.PagesGen.page(3L).row
    val sloppy = graft.pipeline.Pipeline.sloppySegmentPage(p)
    // margins create real overlaps between adjacent paragraphs
    val overlapping = sloppy.blocks.sortBy(_.span.start).sliding(2).count {
      case Seq(x, y) => x.span.stop > y.span.start
      case _ => false
    }
    assert(overlapping > 0, "sloppy segmenter produced no overlaps")
    val out = SpanClaims.clip(sloppy.blocks)
    out.sliding(2).foreach {
      case Seq(x, y) => assert(x.span.stop <= y.span.start)
      case _ =>
    }
  }
}

class MorphLabelSpec extends AnyFunSuite {
  test("propagate_labels_majority: component takes the majority claimant's label") {
    val comps = Seq(Span(0, 10), Span(12, 20), Span(30, 40))
    val labels = Seq((Span(0, 6), 1), (Span(5, 19), 2))
    // comp0: label1 covers 6, label2 covers 5 -> 1; comp1: only label2;
    // comp2: untouched -> 0
    assert(SpanClaims.propagateLabelsMajority(comps, labels) == Seq(1, 2, 0))
  }

  test("propagate ties resolve to the lower label") {
    val out = SpanClaims.propagateLabelsMajority(
      Seq(Span(0, 10)), Seq((Span(0, 5), 7), (Span(5, 10), 3)))
    assert(out == Seq(3))
  }

  test("spread_labels grows spans toward the midpoint, capped at maxdist") {
    val out = SpanClaims.spreadLabels(Seq(Span(0, 10), Span(30, 40)), maxdist = 4)
    assert(out == Seq(Span(0, 14), Span(26, 40)))
    val close = SpanClaims.spreadLabels(Seq(Span(0, 10), Span(14, 20)), maxdist = 50)
    assert(close == Seq(Span(0, 12), Span(12, 20)))
  }
}

class RegionGroupSpec extends AnyFunSuite {
  test("groupRegions splits text runs at sep/img/boilerplate boundaries") {
    val blocks = HtmlBlocks.segment(graft.fixtures.PagesGen.page(4L).row.html)
    val regions = HtmlBlocks.groupRegions(blocks)
    // the synthetic page has exactly one <hr/> separator inside the text
    // run: h1 + leading paragraphs are region 0, trailing paragraphs 1
    assert(regions.map(_._1).distinct == Seq(0, 1))
    val r0 = regions.filter(_._1 == 0).map(_._2)
    assert(r0.head.text.head.isUpper) // starts at the h1 line
    // regions partition the text blocks in order
    assert(regions.map(_._2) == blocks.filter(_.kind == "text"))
  }
}

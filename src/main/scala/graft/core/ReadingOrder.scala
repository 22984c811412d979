package graft.core

/** Geometric reading order — exact port of the reference's partial-order
  * construction + topological sort (ocropy/ocrolib/psegutils.py:114-170):
  *
  *  - `i before j` when the boxes x-overlap and i is above j, OR when
  *    they don't x-overlap, nothing separates them, and i is left of j;
  *  - `topsort` is the reference's DFS (visit predecessors, append) with
  *    its exact tie behavior (scan order = input order).
  *
  * The web engine's DOM blocks are a single text column (synthetic boxes
  * via [[boxesFor]]), where this reduces to document order — but layout-
  * aware segmenters (multi-column, floats) produce real 2-D boxes, and
  * this is the operator that orders them.
  */
object ReadingOrder {

  /** A 2-D layout box: [y0, y1) rows x [x0, x1) columns (sl.box shape). */
  final case class Box(y0: Double, y1: Double, x0: Double, x1: Double)

  def xOverlaps(u: Box, v: Box): Boolean = u.x0 < v.x1 && u.x1 > v.x0
  def above(u: Box, v: Box): Boolean = u.y0 < v.y0
  def leftOf(u: Box, v: Box): Boolean = u.x1 < v.x0

  /** separates(w, u, v) per psegutils.py:126-130: w vertically spans the
    * pair and horizontally lies between them.
    */
  def separates(w: Box, u: Box, v: Box): Boolean = {
    if (w.y1 < math.min(u.y0, v.y0)) false
    else if (w.y0 > math.max(u.y1, v.y1)) false
    else w.x0 < u.x1 && w.x1 > v.x0
  }

  /** order(i)(j) == true iff line i comes before line j (partial order).
    *
    * Output-identical to the naive triple loop over psegutils.py:114-170,
    * restructured so the separator scan is not O(n) per pair:
    *  - the scan only runs when it can affect the result — `leftOf(u, v)`
    *    must already hold (the naive loop evaluated `exists(separates)`
    *    even when the subsequent `leftOf` test discarded it);
    *  - per fixed `u`, the candidate separators are exactly the boxes
    *    with `w.x0 < u.x1` (the pair-independent half of `separates`),
    *    collected once and held in x1-DESCENDING order, so the per-pair
    *    existence scan stops at the first `w.x1 <= v.x0` — every later
    *    candidate fails the same condition. On column layouts (where
    *    non-overlapping pairs are abundant) the scan terminates after
    *    O(1) candidates: a left-column u admits only left-column
    *    separator candidates, all of which break immediately on the
    *    right-column v's x0. A pathological page can still force long
    *    scans, but the common worst case (thousands of boxes in a few
    *    columns) is O(n^2), bounded in ReadingOrderSpec.
    */
  def order(boxes: IndexedSeq[Box]): Array[Array[Boolean]] = {
    val n = boxes.length
    val o = Array.ofDim[Boolean](n, n)
    // all boxes in x1-descending order, reused to build each u's
    // candidate-separator list already sorted
    val byX1Desc = boxes.indices.sortBy(k => -boxes(k).x1)
    val cand = new Array[Box](n)
    var i = 0
    while (i < n) {
      val u = boxes(i)
      var nc = 0
      var s = 0
      while (s < n) {
        val w = boxes(byX1Desc(s))
        if (w.x0 < u.x1) { cand(nc) = w; nc += 1 }
        s += 1
      }
      var j = 0
      while (j < n) {
        val v = boxes(j)
        if (xOverlaps(u, v)) {
          if (above(u, v)) o(i)(j) = true
        } else if (leftOf(u, v)) {
          // exists w: separates(w, u, v), scanning only candidates with
          // w.x0 < u.x1 in x1-desc order (early exit at w.x1 <= v.x0)
          val lo = math.min(u.y0, v.y0)
          val hi = math.max(u.y1, v.y1)
          var found = false
          var k = 0
          while (!found && k < nc && cand(k).x1 > v.x0) {
            val w = cand(k)
            if (!(w.y1 < lo) && !(w.y0 > hi)) found = true
            k += 1
          }
          if (!found) o(i)(j) = true
        }
        j += 1
      }
      i += 1
    }
    o
  }

  /** DFS topological sort, exact port of psegutils.topsort (including its
    * predecessor-first visit and input-order scan).
    */
  def topsort(o: Array[Array[Boolean]]): Seq[Int] = {
    val n = o.length
    val visited = new Array[Boolean](n)
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    def visit(k: Int): Unit = {
      if (!visited(k)) {
        visited(k) = true
        var l = 0
        while (l < n) {
          if (o(l)(k)) visit(l)
          l += 1
        }
        out += k
      }
    }
    var k = 0
    while (k < n) { visit(k); k += 1 }
    out.toSeq
  }

  /** Recursive X-Y cut (the lines2regions region-former the reference
    * builds geometrically, ocropy/common.py:1172-1810): split the box set
    * at the WIDEST empty gap, alternating between horizontal cuts (gaps in
    * y-coverage) and vertical cuts (gaps in x-coverage), recursing until
    * no gap of at least `minGap` remains. Returns the region index per
    * input box, regions numbered in reading order (top-before-bottom,
    * left-before-right).
    */
  def xyCut(boxes: IndexedSeq[Box], minGap: Double = 1.0): IndexedSeq[Int] = {
    val out = new Array[Int](boxes.length)
    var next = 0
    // widest gap in the 1-D coverage of `lo..hi` intervals; None if < minGap
    def widestGap(ivs: Seq[(Double, Double)]): Option[Double] = {
      val sorted = ivs.sortBy(_._1)
      var coverEnd = sorted.head._2
      var best = 0.0; var bestAt = 0.0
      sorted.drop(1).foreach { case (lo, hi) =>
        if (lo > coverEnd && lo - coverEnd > best) { best = lo - coverEnd; bestAt = (lo + coverEnd) / 2 }
        if (hi > coverEnd) coverEnd = hi
      }
      if (best >= minGap) Some(bestAt) else None
    }
    def recurse(idx: Seq[Int], tryY: Boolean, tryX: Boolean): Unit = {
      if (idx.isEmpty) return
      if (!tryY && !tryX) { idx.foreach(out(_) = next); next += 1; return }
      val yGap = if (tryY) widestGap(idx.map(i => (boxes(i).y0, boxes(i).y1))) else None
      yGap match {
        case Some(cut) =>
          val (above, below) = idx.partition(i => boxes(i).y1 <= cut)
          recurse(above, tryY = true, tryX = true)
          recurse(below, tryY = true, tryX = true)
        case None =>
          val xGap = if (tryX) widestGap(idx.map(i => (boxes(i).x0, boxes(i).x1))) else None
          xGap match {
            case Some(cut) =>
              val (left, right) = idx.partition(i => boxes(i).x1 <= cut)
              recurse(left, tryY = true, tryX = true)
              recurse(right, tryY = true, tryX = true)
            case None =>
              idx.foreach(out(_) = next); next += 1
          }
      }
    }
    recurse(boxes.indices, tryY = true, tryX = true)
    out.toIndexedSeq
  }

  /** Synthetic single-column boxes for DOM blocks: block k is a
    * full-width row at height k (span order = vertical order).
    */
  def boxesFor(blocks: Seq[Block]): IndexedSeq[Box] =
    blocks.zipWithIndex.map { case (_, k) =>
      Box(k.toDouble, k + 1.0, 0.0, 100.0)
    }.toIndexedSeq

  /** Blocks in geometric reading order (identity for the single-column
    * DOM layout; the real ordering path for 2-D layouts).
    */
  def sort(blocks: Seq[Block]): Seq[Block] = {
    val idx = topsort(order(boxesFor(blocks)))
    idx.map(blocks)
  }
}

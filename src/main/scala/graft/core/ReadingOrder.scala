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

  /** order(i)(j) == true iff line i comes before line j (partial order). */
  def order(boxes: IndexedSeq[Box]): Array[Array[Boolean]] = {
    val n = boxes.length
    val o = Array.ofDim[Boolean](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val u = boxes(i); val v = boxes(j)
        if (xOverlaps(u, v)) {
          if (above(u, v)) o(i)(j) = true
        } else if (!boxes.exists(w => separates(w, u, v))) {
          if (leftOf(u, v)) o(i)(j) = true
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

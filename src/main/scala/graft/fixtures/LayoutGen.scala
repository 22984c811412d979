package graft.fixtures

/** Multi-column layout fixture — deterministic pages whose DOM emission
  * order deliberately DIFFERS from the visual reading order, so the
  * geometric reading-order operators (ReadingOrder.order/topsort/xyCut,
  * the psegutils.py:114-170 / segment.py:145-876 ports) must do real
  * work to reconstruct it.
  *
  * Page i: a full-width title box plus nCols(i) columns of touching
  * paragraph boxes, all absolutely positioned. The body paragraphs are
  * emitted ROW-major (and the title LAST), while the true reading order
  * is title first, then COLUMN-major — document order is never the
  * answer for nCols >= 2.
  *
  * Geometry (construction knowledge the expected-side oracle reuses):
  * title at [0,20)x[0, nCols*220-20); column c paragraph r at
  * [40+30r, 70+30r) x [220c, 220c+200) — columns separated by a 20px
  * x-gap, title separated by a 20px y-gap, paragraphs within a column
  * touching (no y-gap, so an X-Y cut keeps each column one region).
  */
object LayoutGen {

  def nCols(i: Long): Int = 2 + (i % 2).toInt
  def nRows(i: Long): Int = 2 + ((i / 2) % 3).toInt

  def url(i: Long): String = s"https://host${i % 100}.example/layout$i"

  def titleText(i: Long): String = s"Layout page $i"
  def paraText(i: Long, c: Int, r: Int): String =
    s"Column ${c + 1} paragraph ${r + 1} of page $i"

  private def div(left: Int, top: Int, w: Int, h: Int, text: String): String =
    s"""<div style="position:absolute;left:${left}px;top:${top}px;""" +
      s"""width:${w}px;height:${h}px">$text</div>"""

  /** The page HTML, body paragraphs row-major and the title last. */
  def html(i: Long): String = {
    val cols = nCols(i); val rows = nRows(i)
    val paras = for (r <- 0 until rows; c <- 0 until cols)
      yield div(220 * c, 40 + 30 * r, 200, 30, paraText(i, c, r))
    val title = div(0, 0, 220 * cols - 20, 20, titleText(i))
    "<html><body>" + (paras :+ title).mkString + "</body></html>"
  }

  /** True reading order + regions by construction: (rank, region, text) —
    * title (region 0), then column c top-to-bottom (region c+1).
    */
  def expectedOrder(i: Long): Seq[(Int, Int, String)] = {
    val cols = nCols(i); val rows = nRows(i)
    val body = for (c <- 0 until cols; r <- 0 until rows)
      yield (c + 1, paraText(i, c, r))
    ((0, titleText(i)) +: body).zipWithIndex.map { case ((reg, t), rank) =>
      (rank, reg, t)
    }
  }
}

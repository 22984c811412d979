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

  // ---- table pages (segment.py's table-cell ordering role) ----
  //
  // A caption box plus a rows x cols grid of CELLS. Reading order for a
  // table is ROW-major (left-to-right within a row, rows top-to-bottom) —
  // the OPPOSITE nesting of the multi-column pages above — and the DOM
  // emits cells COLUMN-major with the caption last, so neither document
  // order nor the column-major composition can pass. Geometry: cells
  // within a row TOUCH horizontally (no x-gap, so an X-Y cut cannot split
  // a row) while rows are separated by a 10px y-gap and the caption by
  // 20px — X-Y cut yields caption + one region per row, and the geometric
  // partial order (leftOf) sequences the cells inside each row.

  def tRows(i: Long): Int = 2 + (i % 3).toInt
  def tCols(i: Long): Int = 2 + ((i / 3) % 2).toInt

  def tableUrl(i: Long): String = s"https://host${i % 100}.example/table$i"

  def captionText(i: Long): String = s"Table page $i"
  def cellText(i: Long, r: Int, c: Int): String =
    s"Cell row ${r + 1} col ${c + 1} of table $i"

  /** The table page HTML: cells column-major, caption last. */
  def tableHtml(i: Long): String = {
    val rows = tRows(i); val cols = tCols(i)
    val cells = for (c <- 0 until cols; r <- 0 until rows)
      yield div(100 * c, 40 + 40 * r, 100, 30, cellText(i, r, c))
    val caption = div(0, 0, 100 * cols, 20, captionText(i))
    "<html><body>" + (cells :+ caption).mkString + "</body></html>"
  }

  /** True table reading order by construction: caption (region 0), then
    * row r left-to-right (region r+1). Emitted WITHOUT geometric code.
    */
  def expectedTableOrder(i: Long): Seq[(Int, Int, String)] = {
    val rows = tRows(i); val cols = tCols(i)
    val body = for (r <- 0 until rows; c <- 0 until cols)
      yield (r + 1, cellText(i, r, c))
    ((0, captionText(i)) +: body).zipWithIndex.map { case ((reg, t), rank) =>
      (rank, reg, t)
    }
  }
}

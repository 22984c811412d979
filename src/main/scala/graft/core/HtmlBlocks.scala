package graft.core

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** HTML -> DOM text blocks with byte-span lineage.
  *
  * This is the web re-binding of the reference's image pipeline roles
  * (SURVEY.md §2.9): binarize/nlbin -> decode + normalize
  * (ocropy/common.py:204-247), compute_segmentation -> block splitting
  * (common.py:1001-1147), compute_colseps/hlines/images -> the `sep`/`img`
  * anti-mask classes (common.py:452-696), remove_noise -> micro-block drop
  * (common.py:1153-1169), borderclean -> header/footer boilerplate strip
  * (common.py:251-297). Block classification uses Boilerpipe-style shallow
  * text features (text density + link density), per BASELINE.json.
  *
  * The tokenizer is a single forward scan over the decoded string with a
  * parallel byte-offset track, so every emitted block carries an exact
  * [start, stop) byte span into the original `html` BINARY column — the
  * char-span lineage invariant (the web analog of Coords polygons,
  * div/importer.py:41-45). Pure and row-local: runs inside Dataset.map with
  * no shuffle, embarrassingly parallel at 10^12 rows.
  */
object HtmlBlocks {

  /** Tags that open/close a block-level boundary. */
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "section", "article",
    "main", "aside", "nav", "header", "footer", "br", "hr",
    "figure", "figcaption", "body", "head"
  )

  /** Tags whose entire raw content is skipped. */
  private val rawSkipTags = Set("script", "style", "noscript", "template")

  /** Container tags whose blocks are boilerplate (the reference's
    * region-type "ignore" mask, segment.py:248-263 / clip.py:107-121).
    */
  private val boilerplateTags = Set("nav", "header", "footer", "aside", "title")

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "shy" -> "", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "szlig" -> "ß",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü", "Auml" -> "Ä",
    "Ouml" -> "Ö", "Uuml" -> "Ü"
  )

  /** Minimum visible chars for a text block — the micro-block noise filter
    * (role of remove_noise, ocropy/common.py:1153-1169).
    */
  val minBlockChars = 2

  /** Link-density threshold above which a text block is boilerplate. */
  val maxLinkDensity = 0.5

  private final class Scanner(html: String) {
    var i = 0 // char index
    var byteOff = 0L // byte offset of char i in UTF-8
    def eof: Boolean = i >= html.length
    def ch: Char = html.charAt(i)
    def advance(): Unit = {
      val c = html.charAt(i)
      byteOff +=
        (if (c < 0x80) 1
         else if (c < 0x800) 2
         else if (Character.isHighSurrogate(c) || Character.isLowSurrogate(c)) 2 // half of a 4-byte pair
         else 3)
      i += 1
    }
  }

  /** Decode bytes (UTF-8, Latin-1 fallback) and segment into blocks. */
  def segment(htmlBytes: Array[Byte]): Seq[Block] =
    segment(htmlBytes, minBlockChars, maxLinkDensity)

  def segment(htmlBytes: Array[Byte], minChars: Int, maxLink: Double): Seq[Block] = {
    val html =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        dec.decode(java.nio.ByteBuffer.wrap(htmlBytes)).toString
      } catch {
        case _: java.nio.charset.CharacterCodingException =>
          new String(htmlBytes, StandardCharsets.ISO_8859_1)
      }
    segmentString(html, minChars, maxLink)
  }

  def segmentString(html: String): Seq[Block] =
    segmentString(html, minBlockChars, maxLinkDensity)

  /** Threshold-parameterized variant (GraftConfig knobs: the remove_noise
    * floor and borderclean link-density cut); the no-arg overload keeps
    * the shipped constants.
    */
  def segmentString(html: String, minChars: Int, maxLink: Double): Seq[Block] = {
    val s = new Scanner(html)
    val lowerHtml = html.toLowerCase
    val blocks = ArrayBuffer[Block]()
    val text = new StringBuilder
    var blockStart = -1L // byte offset of first visible char
    var blockStop = 0L // byte offset one past last visible char
    var linkChars = 0
    var tagsInBlock = 0
    var linkDepth = 0
    var boilerDepth = 0
    var blockIdx = 0

    def emit(kind: String, span: Span, txt: String, td: Double, ld: Double): Unit = {
      blocks += Block(f"b$blockIdx%04d", kind, span, txt, td, ld)
      blockIdx += 1
    }

    def flush(): Unit = {
      val norm = TextNorm.normalize(text.toString)
      if (norm.nonEmpty && blockStart >= 0) {
        val tChars = norm.count(!_.isWhitespace).max(1)
        val linkDensity = linkChars.toDouble / tChars
        val textDensity = tChars.toDouble / (1 + tagsInBlock)
        val kind =
          if (boilerDepth > 0 || linkDensity > maxLink || norm.length < minChars)
            "boilerplate"
          else "text"
        emit(kind, Span(blockStart, blockStop), norm, textDensity, linkDensity)
      }
      text.clear(); blockStart = -1L; linkChars = 0; tagsInBlock = 0
    }

    def appendVisible(rep: String, startByte: Long, stopByte: Long): Unit = {
      if (rep.exists(!_.isWhitespace)) {
        if (blockStart < 0) blockStart = startByte
        blockStop = stopByte
      }
      text.append(rep)
      if (linkDepth > 0) linkChars += rep.count(!_.isWhitespace)
    }

    while (!s.eof) {
      val c = s.ch
      if (c == '<') {
        val tagByteStart = s.byteOff
        s.advance()
        if (!s.eof && s.ch == '!') {
          if (html.startsWith("!--", s.i)) {
            val end = html.indexOf("-->", s.i)
            val stop = if (end < 0) html.length else end + 3
            while (s.i < stop) s.advance()
          } else {
            while (!s.eof && s.ch != '>') s.advance()
            if (!s.eof) s.advance()
          }
        } else {
          val closing = !s.eof && s.ch == '/'
          if (closing) s.advance()
          val nameStart = s.i
          while (!s.eof && s.ch.isLetterOrDigit) s.advance()
          val name = lowerHtml.substring(nameStart, s.i)
          var quote: Char = 0
          while (!s.eof && (quote != 0 || s.ch != '>')) {
            val cc = s.ch
            if (quote == 0 && (cc == '"' || cc == '\'')) quote = cc
            else if (quote != 0 && cc == quote) quote = 0
            s.advance()
          }
          if (!s.eof) s.advance() // consume '>'
          tagsInBlock += 1

          if (rawSkipTags.contains(name) && !closing) {
            val idx = lowerHtml.indexOf("</" + name, s.i)
            val stop = if (idx < 0) html.length else idx
            while (s.i < stop) s.advance()
          } else if (name == "a") {
            if (closing) linkDepth = math.max(0, linkDepth - 1) else linkDepth += 1
          } else if (boilerplateTags.contains(name)) {
            flush()
            if (closing) boilerDepth = math.max(0, boilerDepth - 1) else boilerDepth += 1
          } else if (name == "img" && !closing) {
            flush()
            emit("img", Span(tagByteStart, s.byteOff), "", 0.0, 0.0)
          } else if (blockTags.contains(name)) {
            flush()
            if (!closing && name == "hr") {
              // separator block (role of compute_separators_morph,
              // ocropy/common.py:586-652)
              emit("sep", Span(tagByteStart, s.byteOff), "", 0.0, 0.0)
            }
          }
        }
      } else if (c == '&') {
        val entByteStart = s.byteOff
        val semi = html.indexOf(';', s.i + 1)
        if (semi > 0 && semi - s.i <= 10) {
          val name = html.substring(s.i + 1, semi)
          val rep =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try new String(Character.toChars(Integer.parseInt(name.drop(2), 16)))
              catch { case _: Exception => "" }
            else if (name.startsWith("#") && name.drop(1).forall(_.isDigit) && name.length > 1)
              try new String(Character.toChars(name.drop(1).toInt))
              catch { case _: Exception => "" }
            else entities.getOrElse(name, "&" + name + ";")
          while (s.i <= semi) s.advance()
          appendVisible(rep, entByteStart, s.byteOff)
        } else {
          appendVisible("&", s.byteOff, s.byteOff + 1)
          s.advance()
        }
      } else {
        if (c.isWhitespace) {
          if (text.nonEmpty && text.last != ' ') text.append(' ')
          s.advance()
        } else {
          val start = s.byteOff
          s.advance()
          appendVisible(c.toString, start, s.byteOff)
        }
      }
    }
    flush()
    blocks.toSeq
  }

  /** The extracted main text of a page: normalized text of `text` blocks in
    * document order, one line per block (reading order ≙ DOM order; the
    * reference computes it geometrically, psegutils.py:114-170).
    */
  def extractText(blocks: Seq[Block]): String =
    blocks.filter(_.kind == "text").map(_.text).mkString("\n")

  /** lines → regions (ocropy/common.py:1172-1810 `lines2regions` role):
    * group text lines into region-level units. The web re-binding splits
    * the text-block stream at structural boundaries — separators, images
    * and boilerplate runs — the same role column separators and vertical
    * whitespace play in the pixel pipeline. Returns (regionId, block)
    * pairs for the text blocks, region ids dense in reading order.
    */
  private val cssBoxRe =
    """<div style="position:absolute;left:(\d+)px;top:(\d+)px;width:(\d+)px;height:(\d+)px">""".r

  /** Layout-aware segmentation: pair each text block with the 2-D box its
    * absolutely-positioned container declares (CSS left/top/width/height
    * hints — the web analog of the pixel pipeline's measured line boxes,
    * segment.py:145-876). This is the production path that feeds REAL 2-D
    * geometry to [[ReadingOrder.order]]/[[ReadingOrder.topsort]]/
    * [[ReadingOrder.xyCut]]: multi-column and float layouts emit DOM
    * order != reading order, and only the geometric operators recover it.
    * Row-local like [[segment]] — runs inside Dataset.map, no shuffle.
    */
  def segmentLayout(html: String): Seq[(Block, ReadingOrder.Box)] = {
    val (blocks, boxes) = layoutParts(html)
    require(boxes.length == blocks.length,
      s"layout parse mismatch: ${boxes.length} positioned divs vs " +
        s"${blocks.length} text blocks")
    blocks.zip(boxes)
  }

  /** Total variant: `None` for a page whose positioned-div count does not
    * match its text-block count (real HTML mixes absolutely-positioned
    * and flow content freely). This runs row-local inside Dataset.map, so
    * the strict [[segmentLayout]] would fail the WHOLE job on the first
    * non-conforming page — callers over untrusted corpora flatMap this
    * and decide (skip the page / fall back to DOM order); the throwing
    * variant stays for the fixture-driven paths where a mismatch is a
    * generator bug, not data.
    */
  def segmentLayoutOpt(html: String): Option[Seq[(Block, ReadingOrder.Box)]] = {
    val (blocks, boxes) = layoutParts(html)
    if (boxes.length == blocks.length) Some(blocks.zip(boxes)) else None
  }

  private def layoutParts(html: String): (Seq[Block], IndexedSeq[ReadingOrder.Box]) = {
    val blocks = segmentString(html).filter(_.kind == "text")
    val boxes = cssBoxRe.findAllMatchIn(html).map { m =>
      val left = m.group(1).toDouble; val top = m.group(2).toDouble
      ReadingOrder.Box(top, top + m.group(4).toDouble,
        left, left + m.group(3).toDouble)
    }.toIndexedSeq
    (blocks, boxes)
  }

  def groupRegions(blocks: Seq[Block]): Seq[(Int, Block)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Block)]()
    var region = 0
    var regionOpen = false
    blocks.foreach { b =>
      if (b.kind == "text") {
        if (!regionOpen) { regionOpen = true }
        out += ((region, b))
      } else if (regionOpen) {
        // a sep/img/boilerplate boundary closes the open region
        region += 1
        regionOpen = false
      }
    }
    out.toSeq
  }
}

package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Expected pipeline outputs, derived from the GENERATOR's construction
  * knowledge (PagesGen knows exactly which strings it embedded where in the
  * HTML it built) — NOT by running the engine. This puts the pipeline core
  * (segment / extract / align / correct / metrics) under the driver's
  * DuckDB oracle gate: `graft.Verify` materializes these tables to
  * [[Expected.Dir]] before the queries run, and `SparkEntry.oracleSql`
  * reads them back with `read_parquet(...)`. The role model is the
  * reference's golden-workspace assertions
  * (tests/run_alignment_test.bash:6-36): a fixed corpus whose per-page
  * outputs are known a priori.
  *
  * Block spans are recomputed here with plain `indexOf` cursor scans over
  * the generated HTML plus a UTF-8 prefix-length conversion — a different
  * algorithm from the engine's streaming Scanner, so span lineage is
  * genuinely cross-checked. Everything is driver-side: the expected corpus
  * is a 100-page test artifact, not a scale path.
  */
object Expected {

  /** Fixed location the oracle SQL references (the driver runs DuckDB on
    * the same host right after `graft.Verify`, which writes these).
    */
  val Dir = "/tmp/graft_expected"

  /** Pages covered by the p01–p12 pipeline queries. */
  val N = 100

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def cap(s: String): String =
    if (s.isEmpty) s else s"${s.head.toUpper}${s.tail}"

  final case class ExpBlock(
      url: String, block_id: String, kind: String,
      span_start: Long, span_stop: Long, text: String)

  /** Expected segmentation of page i: block ids, kinds, byte spans and
    * normalized texts, located by sequential string search over the HTML
    * that PagesGen constructed. `minBlockChars` mirrors the engine's
    * remove_noise floor (GraftConfig knob): a content block shorter than
    * it is classified boilerplate — the p17 config-query oracle derives
    * the non-default classification from construction knowledge.
    */
  def blocksOf(i: Long, minBlockChars: Int = graft.core.HtmlBlocks.minBlockChars): Seq[ExpBlock] = {
    def textKind(txt: String): String =
      if (txt.length < minBlockChars) "boilerplate" else "text"
    val tp = PagesGen.page(i)
    val h = new String(tp.row.html, Utf8)
    val url = tp.row.url
    val host = url.stripPrefix("https://").takeWhile(_ != '.')
    def byteOff(charIdx: Int): Long = h.substring(0, charIdx).getBytes(Utf8).length.toLong

    val out = ArrayBuffer[ExpBlock]()
    var idx = 0
    var cursor = 0
    def emit(kind: String, startChar: Int, stopChar: Int, text: String): Unit = {
      out += ExpBlock(url, f"b$idx%04d", kind, byteOff(startChar), byteOff(stopChar), text)
      idx += 1
    }
    def locate(s: String): Int = {
      val k = h.indexOf(s, cursor)
      require(k >= 0, s"expected fixture: '$s' not found in page $i")
      cursor = k + s.length
      k
    }

    // <title>doc $i</title> — boilerplate
    val title = s"doc $i"
    val t0 = locate(">" + title + "<") + 1
    emit("boilerplate", t0, t0 + title.length, title)

    // nav links — one boilerplate block spanning Home..here
    val navStart = locate("Home")
    val navLast = "More links here"
    val navStop = locate(navLast) + navLast.length
    emit("boilerplate", navStart, navStop, "Home About More links here")

    // <h1> — the title text line (short titles fall below a raised
    // remove_noise floor and reclassify as boilerplate)
    val h1 = cap(tp.titlePair._2)
    val h1Start = locate("<h1>" + h1) + 4
    emit(textKind(h1), h1Start, h1Start + h1.length, h1)

    // paragraphs, with the <hr/> separator before paragraph nLines/2
    val nLines = tp.linePairs.length
    tp.linePairs.zipWithIndex.foreach { case ((_, corr), j) =>
      if (j == nLines / 2) {
        val k = locate("<hr/>")
        emit("sep", k, k + 5, "")
      }
      val content = cap(corr)
      val pStart = locate("<p>" + content) + 3
      emit(textKind(content), pStart, pStart + content.length, content)
    }

    // <img .../> — whole-tag span
    val imgStart = locate("<img")
    val imgStop = h.indexOf('>', imgStart) + 1
    cursor = imgStop
    emit("img", imgStart, imgStop, "")

    // footer — boilerplate; &copy; is not a decoded entity, so it survives
    // literally in the normalized text
    val fStart = locate("Imprint")
    val fStop = locate(host) + host.length // host = "host<k>", the last visible text
    emit("boilerplate", fStart, fStop, s"Imprint &copy; $host")

    out.toSeq
  }

  /** Expected clip arbitration (p03): extend each expected block span by
    * the sloppy margin, then resolve contested regions with an interval
    * sweep — boundary placement follows the majority-claim rule (the
    * contested region goes to the block for which it is the larger share
    * of itself; the loser is clipped to the boundary).
    */
  def clippedBlocksOf(i: Long, margin: Long = 5): Seq[(String, String, Long, Long)] = {
    val htmlLen = PagesGen.page(i).row.html.length.toLong
    var cur = blocksOf(i).map { b =>
      (b.block_id, math.max(0L, b.span_start - margin), math.min(htmlLen, b.span_stop + margin), b.url)
    }.filter(t => t._3 > t._2)
    var changed = true
    while (changed) {
      changed = false
      val arr = cur.sortBy(t => (t._2, t._3, t._1)).toArray
      var k = 0
      while (k < arr.length - 1) {
        val (ida, sa, ea, u) = arr(k)
        val (idb, sb, eb, _) = arr(k + 1)
        val inter = math.min(ea, eb) - math.max(sa, sb)
        if (inter > 0) {
          changed = true
          val fracA = inter.toDouble / math.max(1L, ea - sa)
          val fracB = inter.toDouble / math.max(1L, eb - sb)
          if (fracA >= fracB) arr(k + 1) = (idb, math.min(ea, eb), eb, u)
          else arr(k) = (ida, sa, math.max(sb, sa), u)
        }
        k += 1
      }
      cur = arr.toSeq.filter(t => t._3 > t._2)
    }
    cur.map(t => (t._4, t._1, t._2, t._3)).sortBy(t => (t._1, t._2))
  }

  /** Expected extracted main text: text blocks in document order. */
  def extractedTextOf(i: Long): String = {
    val tp = PagesGen.page(i)
    (cap(tp.titlePair._2) +: tp.linePairs.map(p => cap(p._2))).mkString("\n")
  }

  /** Number of corrupted tokens the corrector must fix on page i. */
  def nCorrectionsOf(i: Long): Int = {
    val tp = PagesGen.page(i)
    (tp.titlePair +: tp.linePairs).map { case (truth, corr) =>
      truth.split(" ").zip(corr.split(" ")).count(p => p._1 != p._2)
    }.sum
  }

  def writeAll(spark: SparkSession, dir: String = Dir, n: Int = N): Unit = {
    import spark.implicits._
    val ids = (0L until n.toLong)

    val blocks = ids.flatMap(blocksOf(_))
    blocks.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/blocks.parquet")

    // non-default-config segmentation (p17): remove_noise floor raised to
    // 15 visible chars — short titles reclassify as boilerplate. The knob
    // must actually BITE on this corpus, or the config query would pass
    // vacuously against the default classification.
    val cfgBlocks = ids.flatMap(blocksOf(_, minBlockChars = 15))
    require(cfgBlocks.count(_.kind == "text") < blocks.count(_.kind == "text"),
      "minBlockChars=15 reclassified nothing — p17 would not discriminate")
    cfgBlocks.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/blocks_cfg.parquet")

    ids.flatMap(i => clippedBlocksOf(i))
      .toDF("url", "block_id", "span_start", "span_stop")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/clipped.parquet")

    // expected regions: construction knowledge — region 0 is the h1 plus
    // the paragraphs before the <hr/> (which sits before paragraph
    // nLines/2), region 1 the paragraphs after it
    ids.flatMap { i =>
      val tp = PagesGen.page(i)
      val textIds = blocksOf(i).filter(_.kind == "text").map(_.block_id)
      val firstRegion = 1 + tp.linePairs.length / 2 // h1 + paras before hr
      textIds.zipWithIndex.map { case (id, k) =>
        (tp.row.url, id, if (k < firstRegion) 0 else 1)
      }
    }.toDF("url", "block_id", "region_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/regions.parquet")

    ids.map(i => (PagesGen.page(i).row.url, extractedTextOf(i)))
      .toDF("url", "extracted_text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/extracted.parquet")

    // line variants: per text block, master (index 1, x-master) and the
    // alt reading (index 2, x-alt) with the provenance tags of
    // align/cli.py:96-108. Line confidences recompute the engine's
    // deterministic glyph-conf surrogate fold (ConfSurrogate is a stub for
    // a recognizer that doesn't ship here, so the surrogate itself is the
    // spec; the value cross-checked is the variant/confidence PLUMBING).
    val variants = ids.flatMap { i =>
      val url = PagesGen.page(i).row.url
      blocksOf(i).filter(_.kind == "text").flatMap { b =>
        val alt = graft.core.TextNorm.normalize(b.text.replace("rn", "m").replace("c", "e"))
        Seq(
          (url, b.block_id, 1, b.text,
            graft.core.ConfSurrogate.lineConf("x-master", url, b.block_id, b.text, 0.9),
            s"ocrd-cis-line-alignment-master-ocr:x-master/${b.block_id}"),
          (url, b.block_id, 2, alt,
            graft.core.ConfSurrogate.lineConf("x-alt", url, b.block_id, alt, 0.8),
            s"ocrd-cis-line-alignment:x-alt/${b.block_id}"))
      }
    }
    variants.toDF("url", "line_id", "variant_index", "text", "conf", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/variants.parquet")

    // corrected output: every injected corruption is correctable by
    // construction (PagesGen.corrupt never collides with a lexicon word),
    // so the expectation is byte-identical golden text with exactly the
    // injected number of corrections
    ids.map { i =>
      val tp = PagesGen.page(i)
      (tp.row.url, tp.row.lang, tp.trueText, nCorrectionsOf(i), tp.trueText)
    }.toDF("url", "lang", "corrected_text", "n_corrections", "golden")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/corrected.parquet")

    // expected media metadata (p07) and frame spans (p08): payloads are
    // the generator's own html bytes, the checksum is an INDEPENDENT
    // FNV-1a implementation (a public standard hash — recomputing it here
    // cross-checks payload integrity through the mapPartitions plumbing),
    // header fields replicate the documented StubCodec formulas (the stub
    // IS the spec until a real codec ships), and frame spans are the
    // structural evenly-spaced-slice rule.
    def fnv1a(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= b & 0xffL; h *= 0x100000001b3L }
      h
    }
    ids.map { i =>
      val tp = PagesGen.page(i)
      val h = fnv1a(tp.row.html)
      val w = 160 + (Math.floorMod(h, 8L) * 80L).toInt
      val ht = 120 + (Math.floorMod(h >>> 8, 8L) * 60L).toInt
      val dur = 1000L + Math.floorMod(h >>> 16, 60000L)
      (tp.row.url, "text/html", tp.row.html.length.toLong, h, w, ht, dur)
    }.toDF("url", "mediaType", "nBytes", "checksum", "width", "height", "durationMs")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/media_meta.parquet")

    // expected resize stats (p16): same stub-is-spec contract as p07 —
    // geometry from the documented StubCodec formulas, downsample as the
    // area-ratio stride rule, checksum via the independent FNV-1a
    ids.map { i =>
      val tp = PagesGen.page(i)
      val bytes = tp.row.html
      val h0 = fnv1a(bytes)
      val w = 160 + (Math.floorMod(h0, 8L) * 80L).toInt
      val ht = 120 + (Math.floorMod(h0 >>> 8, 8L) * 60L).toInt
      val n = bytes.length
      val outLen = math.max(16L, n.toLong * (320L * 240L) / math.max(1L, w.toLong * ht))
        .min(n.toLong).toInt
      val out = Array.tabulate(outLen)(j => bytes((j.toLong * n / outLen).toInt))
      (tp.row.url, w, ht, outLen.toLong, fnv1a(out))
    }.toDF("url", "orig_w", "orig_h", "n_bytes", "checksum")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/resized.parquet")

    ids.flatMap { i =>
      val tp = PagesGen.page(i)
      val len = tp.row.html.length.toLong
      val frameBytes = 64L
      val frames = math.min(4L, math.max(1L, len / frameBytes)).toInt
      (0 until frames).map { k =>
        val start = math.max(0L, len - frameBytes) * k / math.max(1, frames - 1).toLong
        (tp.row.url, k, start, math.min(len, start + frameBytes))
      }
    }.toDF("url", "frame_idx", "span_start", "span_stop")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/frames.parquet")

    // expected checkpoint ledger (p10): bucket = pmod(xxhash64(url), 8)
    // over the 200-page corpus, recomputed with the INDEPENDENT XXH64
    // implementation (XxHash64Ref) — cross-checks the engine's bucket
    // assignment and per-bucket row accounting without Spark's hasher
    val ledgerCounts = scala.collection.mutable.TreeMap.empty[Int, Long]
    (0L until 200L).foreach { i =>
      val h = XxHash64Ref.sparkHash(PagesGen.page(i).row.url)
      val b = (((h % 8) + 8) % 8).toInt
      ledgerCounts(b) = ledgerCounts.getOrElse(b, 0L) + 1L
    }
    ledgerCounts.toSeq.map { case (b, c) => ("segment", b, c) }
      .toDF("stage", "bucket", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ledger.parquet")

    // expected confusion-profile counts, aggregated driver-side from the
    // generator's word-parallel (true, corrupted) pairs — a different data
    // path than the engine's (segment -> line zip -> line-level alignment
    // -> distributed groupBy), cross-checking segmentation, line pairing
    // and the aggregation. The edist kernel itself is shared; its own
    // vectors live in EdistSpec.
    val counts = scala.collection.mutable.TreeMap.empty[(String, String), Long]
    ids.foreach { i =>
      val tp = PagesGen.page(i)
      (tp.titlePair +: tp.linePairs).foreach { case (t, c) =>
        cap(t).split(" ").zip(cap(c).split(" ")).foreach { case (tw, cw) =>
          if (tw != cw)
            graft.core.ConfusionProfile.pairsOf(cw, tw).foreach { p =>
              counts(p) = counts.getOrElse(p, 0L) + 1L
            }
        }
      }
    }
    counts.toSeq.map { case ((l, r), c) => (l, r, c) }
      .toDF("pat_left", "pat_right", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/confusions.parquet")

    // expected head-eval corpus facts (q47) over the held-out pages
    // [300, 700): the clean validation slice [300, 500) (every corruption
    // correctable by construction) PLUS the hard-eval slice [500, 700)
    // whose generator injects DELIBERATELY-UNCORRECTABLE garbles — so the
    // failure counters the oracle derives are nonzero generator facts and
    // a miscounted failure path in the engine cannot pass. Per-token
    // classification comes from the construction-time (true, corrupted)
    // pairs, never from the engine:
    //  - corrupted == true            -> clean
    //  - corrupted has no alnum char  -> symbol garble (engine: non_alnum
    //    -> missed; no decision head ever sees it)
    //  - corrupted capitalized        -> pseudo-entity garble (exact shape
    //    of valid entities -> LE protects it -> le_extended on a corrupted
    //    token = false_extension AND missed)
    //  - otherwise                    -> correctable channel corruption
    //    (engine must fix it -> accepted_right)
    (300L until 700L).map { i =>
      val tp = PagesGen.page(i)
      val nTokens = tp.trueText.split("\n").map(_.split(" ", -1).length.toLong).sum
      var nCorrectable = 0L; var nSym = 0L; var nEnt = 0L
      (tp.titlePair +: tp.linePairs).foreach { case (t, c) =>
        t.split(" ", -1).zip(c.split(" ", -1)).foreach { case (tw, cw) =>
          if (tw != cw) {
            // classification invariant (ADVICE r4): garble SHAPES may only
            // occur inside the deliberate-garble range — a future channel
            // pattern or capitalization tweak producing an all-punct or
            // capitalized corruption elsewhere would silently desync the
            // per-class counts, so it fails loudly at fixture-build time
            if (!cw.exists(_.isLetterOrDigit)) {
              require(i >= 500 && i < 700,
                s"page $i: symbol-garble shape '$tw'->'$cw' outside [500,700)")
              nSym += 1
            } else if (cw.head.isUpper) {
              require(i >= 500 && i < 700,
                s"page $i: entity-garble shape '$tw'->'$cw' outside [500,700)")
              nEnt += 1
            } else nCorrectable += 1
          }
        }
      }
      (tp.row.url, tp.trueText, nCorrectable, nSym, nEnt, nTokens)
    }.toDF("url", "golden", "n_correctable", "n_garble_sym", "n_garble_ent", "n_tokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/headeval.parquet")

    // expected per-book eval (q54): per page of [300, 900), the master
    // extraction's and the corrected text's CER-style token distance to
    // golden (case-folded positional word levenshtein), derived from the
    // generator's construction facts:
    //  - clean token                  -> 0 / 0
    //  - correctable corruption       -> d / 0      (engine must fix it)
    //  - symbol / pseudo-entity garble-> d / d      (missed / LE-protected)
    //  - MISLEADING garble (t, w, c)  -> d / lev(t, w)  (the channel model
    //    "corrects" c to the wrong source w — the deterioration class,
    //    PagesGen.misleadTriples, pages [700, 900) only)
    // The q54 oracle aggregates this table per book (url host) with a
    // ROLLUP total; the engine must reproduce it by replaying production
    // correction — so a head regression that breaks or worsens ANY page
    // bucket shows up as a hash mismatch.
    val bookRows = (300L until 900L).map { i =>
      val tp = PagesGen.page(i)
      val mis = PagesGen.misleadTriples(tp.row.lang)
        .map(tr => (tr._1, tr._3) -> tr._2).toMap
      var master = 0L; var corrected = 0L
      (tp.titlePair +: tp.linePairs).foreach { case (t, c) =>
        t.split(" ", -1).zip(c.split(" ", -1)).foreach { case (tw, cw) =>
          val d = graft.core.Edist.levenshtein(tw.toLowerCase, cw.toLowerCase).toLong
          master += d
          if (tw != cw) {
            mis.get((tw, cw)) match {
              case Some(w) =>
                require(i >= 700 && i < 900,
                  s"page $i: mislead pair '$tw'->'$cw' outside [700,900)")
                corrected += graft.core.Edist.levenshtein(tw.toLowerCase, w).toLong
              case None =>
                // garble shapes may ONLY occur in the hard-eval range —
                // anywhere else they would silently reclassify a
                // correctable corruption (ADVICE r4: assert the
                // generator/classifier contract at fixture-build time)
                if (!cw.exists(_.isLetterOrDigit)) {
                  require(i >= 500 && i < 700,
                    s"page $i: symbol-garble shape '$tw'->'$cw' outside [500,700)")
                  corrected += d
                } else if (cw.head.isUpper) {
                  require(i >= 500 && i < 700,
                    s"page $i: entity-garble shape '$tw'->'$cw' outside [500,700)")
                  corrected += d
                }
                // else: correctable — engine restores the truth -> 0
            }
          }
        }
      }
      val book = tp.row.url.stripPrefix("https://").takeWhile(_ != '.')
      (book, tp.row.url, master, corrected)
    }
    // the eval corpus must exercise all three buckets, or the report
    // degenerates (VERDICT r4 #4: nonzero improved AND worsened)
    require(bookRows.exists(r => r._4 < r._3), "no improved pages in [300,900)")
    require(bookRows.exists(r => r._4 > r._3), "no worsened pages in [300,900)")
    require(bookRows.exists(r => r._4 == r._3), "no unchanged pages in [300,900)")
    bookRows.toDF("book", "url", "master_dist", "corrected_dist")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bookeval.parquet")

    // expected prediction import (q48): the importer algorithm
    // (div/importer.py:150-203) re-run as a DIRECT driver-side scan over
    // the fixture lines — chars split into words on ' ', per-word midrange
    // confidence over the char probabilities, word bounds from the first
    // char's globalStart to the last char's globalEnd, line confidence as
    // the midrange over word confidences. Cross-checks the engine's
    // from_json + window + groupBy restructuring through a different code
    // path (imperative scan vs relational regrouping); the per-char
    // probability formula is the fixture's spec, shared by construction.
    ids.flatMap { i =>
      val tp = PagesGen.page(i)
      tp.trueText.split("\n").zipWithIndex.flatMap { case (line, lid) =>
        // word boundaries exactly like the importer's char loop
        val words = scala.collection.mutable.ArrayBuffer[List[Int]]()
        var cur = List.empty[Int]
        line.zipWithIndex.foreach { case (c, k) =>
          if (c == ' ') { words += cur.reverse; cur = Nil }
          else {
            cur = k :: cur
            if (k == line.length - 1) words += cur.reverse
          }
        }
        val wconfs = words.map { ks =>
          val confs = ks.map(k => Predictions.charProb(tp.row.url, lid, k))
          (confs.min + confs.max) / 2.0
        }
        val lineConf = (wconfs.min + wconfs.max) / 2.0
        words.zipWithIndex.map { case (ks, wi) =>
          val confs = ks.map(k => Predictions.charProb(tp.row.url, lid, k))
          (tp.row.url, lid, wi,
            ks.map(line.charAt).mkString,
            ks.length,
            (confs.min + confs.max) / 2.0,
            2L * ks.head, 2L * ks.last + 1L,
            confs.mkString(","),
            lineConf)
        }
      }
    }.toDF("url", "line_id", "word_idx", "word", "n_glyphs", "wconf",
      "word_start", "word_end", "glyph_confs", "line_conf")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/predimport.parquet")

    // expected layout reading order (q49): the generator's construction
    // order — title first, then column-major — emitted WITHOUT any
    // geometric code. The engine must reconstruct it from the CSS boxes
    // through the ported order/topsort/xyCut operators, against a DOM
    // that emits paragraphs row-major with the title last.
    (0L until 100L).flatMap { i =>
      LayoutGen.expectedOrder(i).map { case (rank, region, text) =>
        (LayoutGen.url(i), rank, region, text)
      }
    }.toDF("url", "rank", "region", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/layout_order.parquet")

    // expected table-cell reading order (q52): the table generator's
    // construction order — caption first, then ROW-major cells — again
    // without geometric code; the engine must reconstruct it via
    // xyCut-then-order over a column-major DOM.
    (0L until 100L).flatMap { i =>
      LayoutGen.expectedTableOrder(i).map { case (rank, region, text) =>
        (LayoutGen.tableUrl(i), rank, region, text)
      }
    }.toDF("url", "rank", "region", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/table_order.parquet")
  }
}

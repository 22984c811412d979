package graft.pipeline

import graft.core._
import graft.fixtures.PagesGen
import org.apache.spark.sql.{Dataset, SparkSession}

/** The end-to-end extraction + post-correction pipeline — the Spark
  * restatement of the reference's processor chain (SURVEY.md §3):
  *
  *   Stage A  segment   : html BINARY -> blocks (binarize+segment roles)
  *   Stage B  extract   : k candidate extractors -> per-line variants
  *                        (the nOCR=2 arity of recognize.py, config.json:8)
  *   Stage C  align     : multi-sequence alignment with TextEquiv
  *                        index/provenance rules (align/cli.py:82-172)
  *   Stage D  correct   : profiler candidates + RR rank + DM decide
  *                        (postcorrect/cli.py:31-46, config.json)
  *
  * Scale design: A–D are a single shuffle-free narrow `map` chain — each
  * page's k variants derive from the same `html` row (unlike the reference,
  * where k OCR engines are separate processes), so no union+groupBy(url) is
  * needed and the whole pipeline is one whole-stage pass over the scan.
  * The only shuffles in the engine are the final metric rollups.
  */
object Pipeline {

  /** Candidate extractor k — the role of the k OCR engines
    * (ocropy/recognize.py:119-303). Extractor 0 is the master; extractor 1
    * is a deliberately different reading (its systematic confusions feed the
    * MatchingOCRTokens/CandidateMatchingOCRs features).
    */
  final case class Extractor(name: String, conf: Double, transform: String => String)

  val extractors: Seq[Extractor] = Seq(
    Extractor("x-master", 0.9, identity),
    Extractor("x-alt", 0.8, s => s.replace("rn", "m").replace("c", "e"))
  )

  // ---- Stage A: segmentation ----

  def segmentPage(p: PageRow): SegmentedPage =
    SegmentedPage(p.url, p.lang, HtmlBlocks.segment(p.html))

  def segment(pages: Dataset[PageRow]): Dataset[SegmentedPage] = {
    import pages.sparkSession.implicits._
    pages.map(segmentPage)
  }

  // ---- Stage B+C: variants + alignment (row-local) ----

  def alignPage(sp: SegmentedPage): AlignedPage = {
    val lines = sp.blocks.filter(_.kind == "text").map { b =>
      val versions = extractors.map { ex =>
        MultiAlign.LineVersion(ex.name, b.id, TextNorm.normalize(ex.transform(b.text)), ex.conf)
      }
      MultiAlign.alignLine(versions, b.span)
    }
    AlignedPage(sp.url, sp.lang, lines)
  }

  def align(seg: Dataset[SegmentedPage]): Dataset[AlignedPage] = {
    import seg.sparkSession.implicits._
    seg.map(alignPage)
  }

  // ---- profile learning (train path) ----

  /** (masterLine, goldenLine) training pairs through the ENGINE's extract
    * path: segment the training pages, take the text blocks in reading
    * order, zip positionally against the golden lines (the role of the
    * reference's GT-annotated training workspace,
    * run_training_test.bash:21-31). Golden text is resolved from the page
    * index carried in the synthetic url.
    */
  def trainingPairs(spark: SparkSession, n: Long): Dataset[(String, String)] = {
    import spark.implicits._
    generate(spark, n).flatMap { p =>
      val i = p.url.substring(p.url.lastIndexOf('p') + 1).toLong
      val golden = PagesGen.page(i).trueText.split("\n")
      val masters = HtmlBlocks.segment(p.html).filter(_.kind == "text").map(_.text)
      masters.zip(golden)
    }
  }

  /** Learn the OCR confusion profile from aligned training data:
    * confusions → groupBy(left, right).count() → top-k by frequency.
    * Deterministic order (count desc, then lexicographic). The collected
    * profile is tiny (distinct confusion pairs) and is broadcast into the
    * correction stage — the loop edist.py:69-83 was built to close.
    */
  def learnProfile(spark: SparkSession, n: Long = 200,
      minCount: Long = 5, maxPatterns: Int = 10): Seq[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    trainingPairs(spark, n)
      .flatMap { case (ocr, gt) => ConfusionProfile.pairsOf(ocr, gt) }
      .toDF("pat_left", "pat_right")
      .groupBy(col("pat_left"), col("pat_right")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("pat_left"), col("pat_right"))
      .limit(maxPatterns)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
  }

  // learned once per JVM (driver side), then broadcast via the lexicons
  @volatile private var cachedProfile: Seq[(String, String)] = null
  def defaultProfile(spark: SparkSession): Seq[(String, String)] = {
    if (cachedProfile == null) synchronized {
      if (cachedProfile == null) cachedProfile = learnProfile(spark)
    }
    cachedProfile
  }

  // ---- Stage D: correction ----

  def correctPage(ap: AlignedPage, lexDe: Lexicon, lexEn: Lexicon): CorrectedPage = {
    val lex = if (ap.lang == "de") lexDe else lexEn
    var total = 0
    val corrected = ap.lines.map { line =>
      val master = line.variants.head.text
      val tokens = master.split(" ", -1).toIndexedSeq
      // per-token view of what the other extractors saw, via the aligned
      // word variants when available
      val otherByIdx: Map[Int, Seq[String]] =
        line.words.zipWithIndex.map { case (w, i) => i -> w.variants.tail.map(_.text) }.toMap
      var n = 0
      val out = tokens.zipWithIndex.map { case (tok, i) =>
        val ctx = otherByIdx.getOrElse(i, Nil)
        val linePos = if (tokens.length <= 1) 0.0 else i.toDouble / (tokens.length - 1)
        val (fixed, changed) =
          Corrector.correctToken(tok, ctx, line.variants.head.conf, linePos, lex)
        if (changed) n += 1
        fixed
      }
      total += n
      CorrectedLine(line.lineId, line.span, out.mkString(" "), n)
    }
    CorrectedPage(ap.url, ap.lang, corrected.map(_.text).mkString("\n"), corrected, total)
  }

  /** Correction with the LEARNED confusion profile (default) — the
    * hard-coded PagesGen.ocrPatterns constants are no longer consumed by
    * the run path, only by the corpus generator itself.
    */
  def correct(aligned: Dataset[AlignedPage]): Dataset[CorrectedPage] =
    correct(aligned, defaultProfile(aligned.sparkSession))

  def correct(aligned: Dataset[AlignedPage],
      ocrPatterns: Seq[(String, String)]): Dataset[CorrectedPage] = {
    val spark = aligned.sparkSession
    import spark.implicits._
    // broadcast the lexicons once (the reference loads its model once per
    // process, recognize.py:94-102)
    val bde = spark.sparkContext.broadcast(
      PagesGen.lexiconFor("de").copy(ocrPatterns = ocrPatterns))
    val ben = spark.sparkContext.broadcast(
      PagesGen.lexiconFor("en").copy(ocrPatterns = ocrPatterns))
    aligned.map(ap => correctPage(ap, bde.value, ben.value))
  }

  /** Full pipeline: one narrow map chain, zero shuffles. */
  def run(pages: Dataset[PageRow]): Dataset[CorrectedPage] =
    correct(align(segment(pages)))

  /** Generate the synthetic corpus as a distributed Dataset (each row is a
    * pure function of its index — no driver-side materialization).
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, parts).map(i => PagesGen.page(i, seed).row)
  }

  /** Golden truth for a generated corpus (test/metric side). */
  def goldenText(i: Long, seed: Long = 42L): String = PagesGen.page(i, seed).trueText

  /** The checkpointed pipeline: table-per-stage (the reference's file-group
    * model, SURVEY §1.2) with per-bucket resume ledgers — the north-star
    * execution mode. Each stage commits hash-buckets independently via
    * [[graft.plans.Checkpoint.runStage]]; a rerun after any crash skips
    * completed buckets per stage and reproduces identical bytes.
    *
    * The shuffle-free [[run]] is the throughput path; this one trades one
    * write+read barrier per stage for stage-granular resume + lineage, the
    * same trade the reference makes with its METS file groups
    * (aio/aio.py:269-298 skip-if-output-exists).
    */
  def runCheckpointed(
      spark: SparkSession,
      root: String,
      n: Long,
      buckets: Int = 32
  ): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.plans.Checkpoint

    val pages = generate(spark, n).toDF()
    val seg = Checkpoint.runStage(spark, "segment", root, pages, "url", buckets) { df =>
      df.as[PageRow].map(segmentPage).toDF()
    }
    val aligned = Checkpoint.runStage(spark, "align", root,
      seg.output.drop("p_bucket"), "url", buckets) { df =>
      df.as[SegmentedPage].map(alignPage).toDF()
    }
    val corrected = Checkpoint.runStage(spark, "correct", root,
      aligned.output.drop("p_bucket"), "url", buckets) { df =>
      correct(df.as[AlignedPage]).toDF()
    }
    corrected.output.drop("p_bucket")
  }
}

package graft.core

/** Core data model of the extraction + post-correction engine.
  *
  * Mirrors the reference's hierarchical page model (PAGE-XML
  * `Page -> TextRegion -> TextLine -> Word -> Glyph`, see
  * /root/reference/ocrd_cis/align/cli.py:63-79) re-expressed as Spark-encodable
  * case classes: `Dataset[Page]` with nested arrays, where the repeated
  * `TextEquiv` list (index, text, conf, provenance) is the central relational
  * trick (reference align/cli.py:96-108,161-172).
  */

/** One input row of the Pages table (BASELINE.json input_hint):
  * (url, warc_ts, html, text, lang). `warcTs` is epoch micros (UTC).
  */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One row of a ground-truth table: full golden text for a url — the
  * relational analog of the reference's GT file group
  * (run_training_test.bash:21-31). Training/eval join on `url` against a
  * table of this shape; any GT corpus written as (url, golden) parquet
  * plugs into Train/headEval unchanged.
  */
final case class GoldenPage(url: String, golden: String)

/** Byte span into the original `html` column — the character-span lineage
  * analog of the reference's Coords polygons (div/importer.py:41-45).
  */
final case class Span(start: Long, stop: Long)

/** One text variant of a line/word — port of PAGE-XML TextEquiv
  * (align/cli.py:96-108): ordered list with 1-based `index`, confidence and
  * provenance tag in `source` (the reference's dataTypeDetails).
  */
final case class TextEquiv(index: Int, text: String, conf: Double, source: String)

/** A DOM block extracted from the HTML byte stream — the web analog of a
  * TextRegion/TextLine (reference ocropy/common.py:1001-1147 segmentation).
  * `kind` in {text, boilerplate, sep, img}; density features are
  * Boilerpipe-style shallow-text features used for the classification.
  */
final case class Block(
    id: String,
    kind: String,
    span: Span,
    text: String,
    textDensity: Double,
    linkDensity: Double
)

/** A line after multi-extractor alignment: variants(0) is the master
  * extraction; variants(i>0) carry provenance tags exactly per the
  * reference's align_lines (align/cli.py:82-109).
  */
final case class AlignedLine(
    lineId: String,
    span: Span,
    variants: Seq[TextEquiv],
    words: Seq[AlignedWord]
)

/** A word with its per-extractor aligned variants
  * (align/cli.py:141-172 align_word_regions) and the master extraction's
  * per-char (glyph) confidences — the Glyph level of the PAGE-XML
  * hierarchy (recognize.py:239-265 word_conf_list), which the
  * Min/Max/AverageOCRCharacterConfidence features consume.
  */
final case class AlignedWord(variants: Seq[TextEquiv], glyphConfs: Seq[Double] = Nil)

/** A correction candidate — the Profiler JSON shape
  * (reference tests/run_training_test.bash:36-45).
  */
final case class Pattern(left: String, right: String, pos: Int)
final case class Candidate(
    suggestion: String,
    modern: String,
    dict: String,
    histPatterns: Seq[Pattern],
    ocrPatterns: Seq[Pattern],
    distance: Int,
    weight: Double
)

/** Extracted + segmented page: the output of Stage A/B. */
final case class SegmentedPage(
    url: String,
    lang: String,
    blocks: Seq[Block]
)

/** Page with aligned lines: output of Stage C. */
final case class AlignedPage(
    url: String,
    lang: String,
    lines: Seq[AlignedLine]
)

/** Final corrected page: output of Stage D, with char-span lineage. */
final case class CorrectedLine(
    lineId: String,
    span: Span,
    text: String,
    corrections: Int
)
final case class CorrectedPage(
    url: String,
    lang: String,
    text: String,
    lines: Seq[CorrectedLine],
    nCorrections: Int
)

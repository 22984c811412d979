package graft.core

import scala.collection.mutable

/** Channel-model profiler: maps suspicious tokens to ranked correction
  * candidates — the re-expression of the reference's external C++ Profiler
  * (protocol at /root/reference/tests/run_training_test.bash:33-46, invoked
  * behind the Java jar, postcorrect/cli.py:31-46).
  *
  * The candidate shape matches the Profiler JSON exactly
  * ({Suggestion, Modern, Dict, HistPatterns, OCRPatterns, Distance, Weight},
  * FIXTURES.md §5). Candidate generation is:
  *   1. exact lexicon hit -> the token itself (Distance 0),
  *   2. confusion-pattern rewrites (historical/OCR patterns, e.g. t->th)
  *      whose result is in the lexicon,
  *   3. bounded edit-distance search via a SymSpell-style delete-1
  *      neighborhood index (scales: the index is built once per lexicon and
  *      broadcast; per-token lookup is O(len), not O(|lexicon|)).
  *
  * maxCandidates = 10 (reference config.json:9).
  */
final case class Lexicon(
    /** word -> relative unigram frequency (0, 1]. */
    unigrams: Map[String, Double],
    /** historical patterns (modern `left` <-> historical `right`), e.g.
      * ("t", "th") per the canonical fixture
      * (run_training_test.bash:36-45: HistPatterns Left=t Right=th).
      */
    histPatterns: Seq[(String, String)],
    /** OCR confusion patterns (truth `left` misread as `right`), learned
      * from alignment confusions (edist.py confusion pairs).
      */
    ocrPatterns: Seq[(String, String)],
    /** char trigram -> relative frequency, the stand-in for the reference's
      * 3gs.csv.gz (data/__main__.py:12-13).
      */
    trigrams: Map[String, Double]
) {

  /** delete-1 variants -> dictionary words (SymSpell-style). */
  @transient lazy val deleteIndex: Map[String, Seq[String]] = {
    val m = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    unigrams.keysIterator.foreach { w =>
      m.getOrElseUpdate(w, mutable.ArrayBuffer.empty) += w
      var i = 0
      while (i < w.length) {
        val v = w.substring(0, i) + w.substring(i + 1)
        m.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += w
        i += 1
      }
    }
    m.view.mapValues(_.distinct.sorted.toSeq).toMap
  }

  def contains(w: String): Boolean = unigrams.contains(w)
  def freq(w: String): Double = unigrams.getOrElse(w, 0.0)
}

object Profiler {

  val MaxCandidates = 10 // reference config.json:9

  /** All single applications of pattern rewrites (each occurrence separately,
    * deterministic left-to-right), tagged with the pattern and position.
    */
  private def rewrites(token: String, patterns: Seq[(String, String)], reverse: Boolean): Seq[(String, Pattern)] = {
    val out = mutable.ArrayBuffer[(String, Pattern)]()
    patterns.foreach { case (left, right) =>
      // historical: modern `left` appears in text as `right` -> replacing
      // right with left modernizes; OCR: truth `left` misread as `right` ->
      // replacing right with left corrects.
      val (from, to) = if (reverse) (left, right) else (right, left)
      if (from.nonEmpty) {
        var idx = token.indexOf(from)
        while (idx >= 0) {
          out += ((token.substring(0, idx) + to + token.substring(idx + from.length),
            Pattern(left, right, idx)))
          idx = token.indexOf(from, idx + 1)
        }
      }
    }
    out.toSeq
  }

  /** Candidate generation for one token (already case-folded/stripped by the
    * caller). Deterministic: candidates ranked by (weight desc, suggestion
    * asc) and capped at MaxCandidates.
    */
  def candidates(token: String, lex: Lexicon): Seq[Candidate] = {
    if (token.isEmpty) return Nil
    val found = mutable.LinkedHashMap.empty[String, Candidate]

    def add(suggestion: String, modern: String, dict: String,
            hist: Seq[Pattern], ocr: Seq[Pattern]): Unit = {
      if (!found.contains(suggestion)) {
        val d = Edist.levenshtein(token, suggestion)
        if (d <= 3) {
          val w = lex.freq(modern) / (1.0 + d)
          found(suggestion) = Candidate(suggestion, modern, dict, hist, ocr, d, w)
        }
      }
    }

    // 1. exact hit
    if (lex.contains(token)) add(token, token, "dict_modern", Nil, Nil)

    // 2. historical-pattern rewrites: token contains historical spelling
    //    `right`; Modern form replaces it with `left`.
    rewrites(token, lex.histPatterns, reverse = false).foreach { case (modern, p) =>
      if (lex.contains(modern))
        add(token, modern, "dict_modern_hypothetic_errors", Seq(p), Nil)
    }

    // 3. OCR-pattern corrections: misread `right` -> truth `left`.
    rewrites(token, lex.ocrPatterns, reverse = false).foreach { case (fixed, p) =>
      if (lex.contains(fixed))
        add(fixed, fixed, "dict_modern", Nil, Seq(p))
      // combined: OCR fix then historical modernization
      rewrites(fixed, lex.histPatterns, reverse = false).foreach { case (modern, hp) =>
        if (lex.contains(modern))
          add(fixed, modern, "dict_modern_hypothetic_errors", Seq(hp), Seq(p))
      }
    }

    // 4. delete-1 neighborhood (covers substitutions/insertions/deletions
    //    within distance 2 of a dictionary word)
    val seen = mutable.HashSet.empty[String]
    def neigh(v: String): Unit =
      lex.deleteIndex.getOrElse(v, Nil).foreach { w =>
        if (seen.add(w)) add(w, w, "dict_modern", Nil, Nil)
      }
    neigh(token)
    var i = 0
    while (i < token.length) {
      neigh(token.substring(0, i) + token.substring(i + 1))
      i += 1
    }

    found.values.toSeq
      .sortBy(c => (-c.weight, c.suggestion))
      .take(MaxCandidates)
  }
}

/** Per-(token, candidate) feature extraction + logistic re-ranker (RR) +
  * decision maker (DM) — re-expression of the reference's Java ML stage
  * (feature catalog /root/reference/ocrd_cis/data/config.json: rrFeatures /
  * dmFeatures; execution contract postcorrect/cli.py:31-46). Weights are
  * fixed fixture constants so ranking and decisions are fully deterministic
  * (the reference ships a pre-trained model.zip the same way).
  */
object Corrector {

  /** Token context: the master token plus what the other extractors saw. */
  final case class TokenCtx(
      token: String,
      otherOcr: Seq[String],
      conf: Double,
      linePos: Double
  )

  def lengthClass(len: Int, short: Int, medium: Int, long: Int): Double =
    if (len <= short) 0.0 else if (len <= medium) 1.0 else if (len <= long) 2.0 else 3.0

  def caseClass(s: String): Double = {
    val letters = s.filter(_.isLetter)
    if (letters.isEmpty) 3.0
    else if (letters.forall(_.isLower)) 0.0
    else if (letters.head.isUpper && letters.tail.forall(_.isLower)) 1.0
    else if (letters.forall(_.isUpper)) 2.0
    else 3.0
  }

  def trigramStats(s: String, trigrams: Map[String, Double]): (Double, Double) = {
    if (s.length < 3) return (0.0, 0.0)
    var mn = Double.MaxValue; var mx = 0.0
    var i = 0
    while (i + 3 <= s.length) {
      val f = trigrams.getOrElse(s.substring(i, i + 3), 0.0)
      if (f < mn) mn = f
      if (f > mx) mx = f
      i += 1
    }
    (mx, if (mn == Double.MaxValue) 0.0 else mn)
  }

  /** RR feature vector, fixed order per config.json rrFeatures
    * (config.json:81-216). 17 features.
    */
  def rrFeatures(t: TokenCtx, c: Candidate, lex: Lexicon): Array[Double] = {
    val (tMax3, tMin3) = trigramStats(t.token, lex.trigrams)
    val (cMax3, cMin3) = trigramStats(c.suggestion, lex.trigrams)
    Array(
      lengthClass(t.token.length, 3, 7, 13), // TokenLengthClass
      caseClass(t.token), // Tokenshape
      t.token.length.toDouble, // TokenLength
      tMax3, // MaxCharTrigram
      tMin3, // MinCharTrigram
      t.conf, // MaxOCRConfidence (surrogate)
      t.otherOcr.count(_ == t.token).toDouble, // MatchingOCRTokens
      t.linePos, // LinePosition
      t.conf, // WordConfidence
      caseClass(c.suggestion), // CandidateCaseClass
      c.histPatterns.length.toDouble, // CandidateHistoricalPatternsDistance
      lengthClass(c.suggestion.length, 3, 8, 13), // CandidateLengthClass
      c.suggestion.length.toDouble, // CandidateLength
      if (c.suggestion == t.token) 1.0 else 0.0, // CandidateMatchesOCR
      t.otherOcr.count(_ == c.suggestion).toDouble, // CandidateMatchingOCRs
      cMax3, // CandidateMaxCharNGram
      cMin3, // CandidateMinCharNGram
      c.weight, // CandidateVoteWeight
      lex.freq(c.modern), // CandidateUnigram
      lex.freq(t.token), // UnigramOCRRelativeFrequency
      math.min(c.distance, 5).toDouble, // LevenshteinDistance (maxThreshold 5)
      if (c.ocrPatterns.nonEmpty) 1.0 else 0.0 // CandidateOCRPatternConfidence
    )
  }

  /** Fixed RR logistic weights (fixture constants; one per rrFeatures slot). */
  val rrWeights: Array[Double] = Array(
    0.05, -0.05, 0.01, 0.4, 0.8, 0.2, 0.3, 0.0, 0.2,
    -0.05, 0.3, 0.05, 0.01, 1.2, 0.8, 0.4, 0.8, 2.0, 1.5, -0.6, -0.9, 2.0
  )
  val rrBias: Double = -0.5

  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  def rrScore(t: TokenCtx, c: Candidate, lex: Lexicon): Double = {
    val f = rrFeatures(t, c, lex)
    var s = rrBias
    var i = 0
    while (i < f.length) { s += f(i) * rrWeights(i); i += 1 }
    sigmoid(s)
  }

  final case class Ranked(candidate: Candidate, score: Double, rank: Int)

  /** Rank candidates (score desc, suggestion asc tie-break) — the
    * HighestRanked*/
  def rank(t: TokenCtx, cands: Seq[Candidate], lex: Lexicon): Seq[Ranked] =
    cands.map(c => (c, rrScore(t, c, lex)))
      .sortBy { case (c, s) => (-s, c.suggestion) }
      .zipWithIndex
      .map { case ((c, s), i) => Ranked(c, s, i + 1) }

  /** DM decision over the best-ranked candidate (dmFeatures: BestRank,
    * BestRankDifferenceToNext, CandidateVoteWeight,
    * CandidateOCRPatternConfidence — config.json:218-247).
    * Accept the correction iff the DM score clears the threshold and the
    * suggestion actually differs.
    */
  val dmThreshold = 0.5
  def decide(t: TokenCtx, ranked: Seq[Ranked], lex: Lexicon): Option[String] = {
    if (ranked.isEmpty) return None
    val best = ranked.head
    if (best.candidate.suggestion == t.token) return None
    if (lex.contains(t.token)) return None // keep in-lexicon tokens
    val diffToNext =
      if (ranked.length > 1) best.score - ranked(1).score else best.score
    val ocrPat = if (best.candidate.ocrPatterns.nonEmpty) 1.0 else 0.0
    val dm = sigmoid(
      2.5 * best.score + 1.5 * diffToNext + 1.0 * best.candidate.weight +
        1.5 * ocrPat - 1.5
    )
    if (dm > dmThreshold) Some(best.candidate.suggestion) else None
  }

  /** Correct one token preserving its punctuation shell and leading-case:
    * split off non-letter prefix/suffix, correct the case-folded core, then
    * re-apply capitalization.
    */
  def correctToken(raw: String, ctx: Seq[String], conf: Double, linePos: Double, lex: Lexicon): (String, Boolean) = {
    val start = raw.indexWhere(_.isLetterOrDigit)
    if (start < 0) return (raw, false)
    val stop = raw.lastIndexWhere(_.isLetterOrDigit) + 1
    val core = raw.substring(start, stop)
    val folded = core.toLowerCase
    val ctxFolded = ctx.map(_.toLowerCase)
    val t = TokenCtx(folded, ctxFolded, conf, linePos)
    val cands = Profiler.candidates(folded, lex)
    decide(t, rank(t, cands, lex), lex) match {
      case Some(sug) =>
        val cased =
          if (core.nonEmpty && core.head.isUpper && sug.nonEmpty)
            sug.head.toUpper + sug.tail
          else sug
        (raw.substring(0, start) + cased + raw.substring(stop), true)
      case None => (raw, false)
    }
  }
}

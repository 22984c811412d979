package graft.core

/** Learned OCR-confusion profile — closes the loop the reference is built
  * around: profiles come from aligned data, not constants
  * (edist.py:69-83 computes the confusion pairs precisely so the profiler
  * can be seeded with them; run_training_test.bash:33-46 shows the trained
  * profile feeding postcorrection).
  *
  * `pairsOf` extracts (truth `left`, misread `right`) pattern pairs from
  * one (ocr, groundTruth) line pair via `Edist.xlevenshtein` with
  * context=0 (no erosion spreading — each corruption yields exactly its
  * differing run, the shape `Lexicon.ocrPatterns` consumes). The profile
  * job is a flatMap → groupBy(left, right) → count → top-k collect: one
  * hash aggregation whose key space is tiny (distinct confusion pairs),
  * so it map-side combines and scales linearly in corpus size.
  */
object ConfusionProfile {

  /** Keep word-internal, short patterns: the corrector operates on folded
    * single tokens, so space-crossing or long-run pairs are unusable.
    */
  def usable(left: String, right: String): Boolean =
    left.nonEmpty && right.nonEmpty &&
      left.length <= 3 && right.length <= 3 &&
      !left.contains(' ') && !right.contains(' ')

  /** Confusion pattern pairs (truth left, misread right) of one aligned
    * (ocr, gt) pair. Gap chars are stripped; unusable pairs dropped.
    */
  def pairsOf(ocr: String, gt: String): Seq[(String, String)] =
    if (gt.isEmpty || ocr == gt) Nil
    else Edist.xlevenshtein(ocr, gt, context = 0).confusions
      .map { case (got, want) => (want.replace("_", ""), got.replace("_", "")) }
      .filter { case (l, r) => usable(l, r) }
}

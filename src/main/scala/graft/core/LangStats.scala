package graft.core

/** Predominant language/font with the reference's fallback chain
  * (div/lang.py:24-88): count line-level annotations; if the line-level
  * counts are unusable — any un-annotated line poisons the whole level
  * (Python's `max` over a dict containing a None key raises TypeError,
  * which lang.py catches as the fallback trigger) — fall back to
  * word-level counts, then to the fixed default ('German' / 'Antiqua').
  * Ties resolve to the first-encountered maximum (Python dict insertion
  * order), so counting preserves first-seen order.
  */
object LangStats {

  /** Predominant value of one annotation level, or None when the level is
    * unusable (empty, or poisoned by a missing annotation).
    */
  def levelPredominant(values: Seq[Option[String]]): Option[String] = {
    if (values.isEmpty || values.contains(None)) return None
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    values.flatten.foreach(v => counts(v) = counts.getOrElse(v, 0) + 1)
    if (counts.isEmpty) None
    else Some(counts.maxBy(_._2)._1) // LinkedHashMap: first max wins
  }

  def predominant(
      lineValues: Seq[Option[String]],
      wordValues: Seq[Option[String]],
      default: String): String =
    levelPredominant(lineValues)
      .orElse(levelPredominant(wordValues))
      .getOrElse(default)

  def predominantLanguage(lineLangs: Seq[Option[String]], wordLangs: Seq[Option[String]]): String =
    predominant(lineLangs, wordLangs, "German")

  def predominantFont(lineFonts: Seq[Option[String]], wordFonts: Seq[Option[String]]): String =
    predominant(lineFonts, wordFonts, "Antiqua")
}

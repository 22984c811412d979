package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic external-recognizer prediction files — the input the
  * reference's importer consumes (div/importer.py:130-150: one JSON file
  * per line with `predictions[0].sentence` and per-char `positions`, each
  * carrying `chars[0].char`, `chars[0].probability`, `globalStart`,
  * `globalEnd`).
  *
  * The JSON layout replicates that published schema; the per-char
  * probability is a deterministic fixture formula (like ConfSurrogate, the
  * stub IS the spec — no real recognizer ships offline), and positions
  * advance 2 units per char (`globalStart = 2k`, `globalEnd = 2k+1`) so
  * word bounds genuinely exercise the start/end bookkeeping rather than
  * collapsing onto char indices.
  */
object Predictions {

  /** Deterministic per-char confidence in [0.50, 0.99]. */
  def charProb(url: String, lineId: Int, k: Int): Double =
    0.5 + (math.abs((url + "#" + lineId + "#" + k).hashCode) % 50) / 100.0

  /** PRECONDITION: `text` is single-space tokenized (no consecutive
    * spaces) — the importer's char loop emits empty words between
    * adjacent spaces while the relational regrouping emits none; the
    * fixture corpus satisfies this by construction.
    */
  def lineJson(url: String, lineId: Int, text: String): String = {
    val positions = text.zipWithIndex.map { case (c, k) =>
      val ch = c match {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case o => o.toString
      }
      s"""{"chars":[{"char":"$ch","probability":${charProb(url, lineId, k)}}],""" +
        s""""globalStart":${2 * k},"globalEnd":${2 * k + 1}}"""
    }.mkString(",")
    val sentence = text.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"predictions":[{"sentence":"$sentence","positions":[$positions]}]}"""
  }

  /** The predictions table: one JSON document per (page, line), built
    * distributed (each row is a pure function of the page index).
    */
  def table(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).flatMap { i =>
      val tp = PagesGen.page(i)
      tp.trueText.split("\n").zipWithIndex.map { case (line, k) =>
        (tp.row.url, k, lineJson(tp.row.url, k, line))
      }
    }.toDF("url", "line_id", "pred_json")
  }
}

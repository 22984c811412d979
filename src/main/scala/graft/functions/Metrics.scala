package graft.functions

import graft.core.Edist
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** CER/WER typed Aggregators — SURVEY.md §2.10's "only true UDAF need":
  * the reference accumulates (edit distance, ground-truth length) pairs
  * across lines and reports their ratio (div/stats.py:60-91,
  * recognize.py:234-235 for CER; wer/cli.py:50-67 for WER).
  *
  * `Aggregator[IN, BUF, OUT]` gives Spark a merge-able buffer, so the
  * accumulation runs as partial (map-side) + final aggregation — the same
  * two-phase shape as built-in aggregates, shuffle traffic is two longs.
  */
object Metrics {

  /** (test, goldenTruth) pairs -> character error rate. */
  val cer: Aggregator[(String, String), (Long, Long), Double] =
    new Aggregator[(String, String), (Long, Long), Double] {
      def zero: (Long, Long) = (0L, 0L)
      def reduce(b: (Long, Long), a: (String, String)): (Long, Long) =
        (b._1 + Edist.levenshtein(a._1, a._2), b._2 + a._2.length)
      def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (Long, Long)): Double =
        if (b._2 == 0L) 0.0 else b._1.toDouble / b._2
      def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** (test, goldenTruth) pairs -> word error rate (whitespace tokens,
    * positional comparison like wer/cli.py:50-61).
    */
  val wer: Aggregator[(String, String), (Long, Long), Double] =
    new Aggregator[(String, String), (Long, Long), Double] {
      def zero: (Long, Long) = (0L, 0L)
      def reduce(b: (Long, Long), a: (String, String)): (Long, Long) = {
        val tw = a._1.split("\\s+").filter(_.nonEmpty)
        val gw = a._2.split("\\s+").filter(_.nonEmpty)
        val incorrect = gw.indices.count(i => i >= tw.length || tw(i) != gw(i))
        (b._1 + incorrect, b._2 + gw.length)
      }
      def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (Long, Long)): Double =
        if (b._2 == 0L) 0.0 else b._1.toDouble / b._2
      def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}

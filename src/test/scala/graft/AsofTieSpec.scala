package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q75's strict as-of semantics on timestamp TIES — the corpus has none
  * (so the oracle can't exercise this), but production event logs at
  * second granularity tie routinely. A view at the SAME timestamp as the
  * purchase must NOT be attributed (strictly-prior only), while an
  * earlier view still is.
  */
class AsofTieSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("same-timestamp view is excluded; earlier view still matches through a tie") {
    import spark.implicits._
    val T = 1700000000000000L // epoch micros
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // user 1: only a same-ts view -> NULL attribution
    // user 2: earlier view + same-ts view -> the EARLIER view wins
    //         (the same-ts one is not strictly prior)
    // user 3: plain prior view -> matched, gap exact
    val rows = Seq(
      (1L, 1L, ts(T), "view", 0.0, ""),
      (2L, 1L, ts(T), "purchase", 1.0, ""),
      (3L, 2L, ts(T - 5000000L), "view", 0.0, ""),
      (4L, 2L, ts(T), "view", 0.0, ""),
      (5L, 2L, ts(T), "purchase", 1.0, ""),
      (6L, 3L, ts(T - 1000000L), "view", 0.0, ""),
      (7L, 3L, ts(T), "purchase", 1.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q75_asof_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toSeq
    assert(got == Seq((2L, -1L, -1.0), (5L, 3L, 5.0), (7L, 6L, 1.0)),
      s"tie semantics diverged: $got")
  }
}

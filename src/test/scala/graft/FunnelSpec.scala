package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q73 gate funnel on a corpus engineered so EVERY level transition is
  * live — the sf0.01 oracle corpus has no exact duplicates surviving its
  * gates, so the dedup demotion (a pass2 doc losing the text-hash rank
  * race) is only exercised here.
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  /** The q60/q61/q62/q73 split bucket, mirrored: md5("split:"+id) first
    * 4 hex digits mod 10.
    */
  private def bucketOf(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"split:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    (java.lang.Long.parseLong(hex, 16) % 10).toInt
  }

  test("every funnel transition is live: junk, contaminated, duplicate, clean") {
    import spark.implicits._
    val idTest = (0L to 99L).find(bucketOf(_) == 9).get // held-out split
    val trainIds = (0L to 99L).filter(i => bucketOf(i) < 8 && i != idTest)
    val Seq(idJunk, idContam, idDup1, idDup2, idClean) = trainIds.take(5)

    def toks(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val marker = "sharedcontaminationmarkerxyz" // 28 chars: one 24-shingle overlap
    val docs = Seq(
      idJunk -> Seq.fill(30)("a").mkString(" "),          // fails quality
      idTest -> s"${toks("t")} $marker",                  // held-out; clean
      idContam -> s"${toks("c")} $marker",                // train + test shingle
      idDup1 -> toks("d"),                                // kept duplicate
      idDup2 -> toks("d"),                                // dropped duplicate
      idClean -> toks("e"))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q73_gate_funnel")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nt = docs.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
    val all = nt.values.sum
    val expected = Seq(
      (0L, "ingest", 6L, all),
      (1L, "quality", 5L, all - nt(idJunk)),
      (2L, "decontam", 4L, all - nt(idJunk) - nt(idContam)),
      (3L, "exact_dedup", 3L, all - nt(idJunk) - nt(idContam) - nt(idDup2)))
    assert(rows.toSeq == expected, s"funnel rows: ${rows.toSeq}")
  }

  test("degenerate corpus (nothing survives) still reports all 4 stages with zeros") {
    import spark.implicits._
    val docs = Seq(0L -> Seq.fill(30)("a").mkString(" "),
      1L -> Seq.fill(40)("b").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel0").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q73_gate_funnel")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, "ingest", 2L, 70L), (1L, "quality", 0L, 0L),
      (2L, "decontam", 0L, 0L), (3L, "exact_dedup", 0L, 0L)),
      s"degenerate funnel lost its report shape: ${rows.toSeq}")
  }
}

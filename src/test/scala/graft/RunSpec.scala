package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit surface (graft.Run): an external PageRow parquet
  * flows through the checkpointed pipeline, a rerun resumes off the
  * ledgers without recomputing, and the resumed output is byte-identical
  * to the clean run.
  */
class RunSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-run-$tag").toString

  test("Run.execute processes an external pages parquet end-to-end") {
    import spark.implicits._
    val pagesPath = tmp("pages") + "/pages.parquet"
    pipeline.Pipeline.generate(spark, 40).toDF().write.mode("overwrite").parquet(pagesPath)

    val root = tmp("out")
    val json = Run.execute(spark, pagesPath, root, buckets = 4)
    assert(json.contains("\"pages\":40"), json)
    assert(json.contains("\"metric\":\"run_docs_per_sec\""), json)
    // a clean run processed every bucket and skipped none
    assert(json.contains("\"processed\":4") && json.contains("\"skipped\":0"), json)
    // all three stages committed all four buckets
    Seq("segment", "align", "correct").foreach { st =>
      val ledger = plans.Checkpoint.readLedger(spark, root, st)
      assert(ledger.map(_.bucket).sorted == (0 until 4), s"$st ledger: $ledger")
      assert(ledger.map(_.rows).sum == 40L, s"$st rows: $ledger")
    }
  }

  test("rerun resumes: no bucket recomputed, output byte-identical") {
    import spark.implicits._
    val pagesPath = tmp("pages2") + "/pages.parquet"
    pipeline.Pipeline.generate(spark, 30).toDF().write.mode("overwrite").parquet(pagesPath)

    val rootClean = tmp("clean")
    Run.execute(spark, pagesPath, rootClean, buckets = 4)
    val rootResume = tmp("resume")
    Run.execute(spark, pagesPath, rootResume, buckets = 4)
    val before = plans.Checkpoint.readLedger(spark, rootResume, "correct")
      .map(e => e.bucket -> e.completedAtMs).toMap
    // second invocation: every stage's ledger is complete, so nothing
    // is reprocessed (commit timestamps unchanged) and the metrics line
    // says so (the clean/resume distinction an operator reads)
    val resumeJson = Run.execute(spark, pagesPath, rootResume, buckets = 4)
    assert(resumeJson.contains("\"processed\":0") &&
      resumeJson.contains("\"skipped\":4"), resumeJson)
    val after = plans.Checkpoint.readLedger(spark, rootResume, "correct")
      .map(e => e.bucket -> e.completedAtMs).toMap
    assert(after == before, "resume rewrote committed buckets")

    def snap(root: String) =
      spark.read.parquet(s"$root/correct/data")
        .select("url", "lang", "text", "nCorrections")
        .as[(String, String, String, Int)].collect().sortBy(_._1).toSeq
    assert(snap(rootResume) == snap(rootClean),
      "resumed output differs from clean run")
  }

  test("synth: input spelling drives the same pipeline") {
    val root = tmp("synth")
    val json = Run.execute(spark, "synth:25", root, buckets = 2)
    assert(json.contains("\"pages\":25"), json)
  }
}

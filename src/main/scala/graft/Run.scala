package graft

import org.apache.spark.sql.SparkSession

/** The spark-submit entry point for the production pipeline — the
  * north-rule execution surface: read a (url, warc_ts, html, text, lang)
  * pages table, run extract+correct through the checkpointed
  * table-per-stage writer, and emit one JSON metrics line.
  *
  *   spark-submit --class graft.Run graft.jar <pages> <outRoot> [buckets]
  *
  * `<pages>` is a PageRow-schema parquet path, or `synth:N` for the
  * deterministic N-page synthetic corpus (fixtures/PagesGen). A rerun
  * with the same outRoot RESUMES: each stage's committed buckets are
  * skipped via its per-bucket ledger (plans/Checkpoint), the metrics
  * line reports processed vs skipped per stage, and the final output
  * bytes are identical to a single clean run (CheckpointSpec /
  * RunSpec pin this). Under spark-submit the launcher's --master and
  * shuffle parallelism win (SparkBoot passes them through untouched).
  */
object Run {

  /** Testable core: runs the checkpointed pipeline and returns the
    * metrics JSON line. Session lifecycle belongs to the caller.
    */
  def execute(spark: SparkSession, pagesArg: String, outRoot: String,
      buckets: Int): String = {
    val pages =
      if (pagesArg.startsWith("synth:"))
        pipeline.Pipeline.generate(spark, pagesArg.stripPrefix("synth:").toLong).toDF()
      else
        spark.read.parquet(pagesArg)
          .select("url", "warc_ts", "html", "text", "lang")
    val t0 = System.nanoTime()
    val (out, stageResults) =
      pipeline.Pipeline.runCheckpointedStaged(spark, outRoot, pages, buckets)
    val nPages = out.count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val stages = stageResults.map { case (st, r) =>
      s""""$st":{"buckets":${r.ledger.size},"rows":${r.ledger.map(_.rows).sum},""" +
        s""""processed":${r.processedBuckets.size},"skipped":${r.skippedBuckets.size}}"""
    }.mkString(",")
    f"""{"metric":"run_docs_per_sec","value":${nPages / math.max(wallSec, 1e-9)}%.1f,"unit":"docs/sec","pages":$nPages,"wall_sec":$wallSec%.2f,"buckets":$buckets,"stages":{$stages},"out":"$outRoot"}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Run <pagesParquet|synth:N> <outRoot> [nBuckets]")
    val spark = SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val buckets = if (args.length > 2) args(2).toInt else 32
    println(execute(spark, args(0), args(1), buckets))
    spark.stop()
  }
}

package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main. Headline metric = end-to-end pipeline throughput
  * (documents/sec extracted + corrected, the BASELINE.json metric) over the
  * deterministic synthetic Pages corpus, plus per-query wall times for every
  * SparkEntry operator over the sf dir.
  *
  * Parallelism comes from SPARK_GRAFT_CPUS (default 32, the driver's
  * local[32] contract); the two-cluster-size scaling evidence
  * (north rule: eff = (docs/s@32 / docs/s@8) / 4 >= 0.8) is produced by
  * running this main at CPUS=8 and CPUS=32 on the same input — see
  * tools/bench_scaling.sh and BENCH/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000").toLong
    val spark = SparkBoot.session(cpus)

    // ---- headline: e2e extract+correct docs/sec ----
    // warmup at FULL size (C2 JIT across all executor threads needs real
    // volume; a small warmup understates steady state ~10x — see
    // tools/StageBench), then timed reps spread across the whole run so a
    // transient noisy-neighbor episode cannot capture every rep (r3's
    // driver run hit one that lasted the entire headline phase)
    def oneRun(): Long =
      Pipeline.run(Pipeline.generate(spark, nDocs, partitions = cpus.toInt * 4)).count()
    def timeRun(): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = oneRun()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    oneRun()
    // first batch of reps: the min is the undisturbed measurement
    val early = (1 to 3).map(_ => timeRun())

    // ---- per-operator query timings over the sf dir ----
    // Protocol (VERDICT r3 #1): one untimed warm pass (codegen + shuffle
    // files + page cache), then TWO timed passes over the full query list,
    // per-query min. Interleaving the passes means a multi-second drift
    // spike at query i in pass 1 would have to recur at the same query in
    // pass 2, minutes later, to survive into the artifact.
    // (skipped in pipeline-only mode, used by the scaling runs where only
    // the headline docs/sec matters)
    val pipelineOnly = sys.env.get("SPARK_GRAFT_PIPELINE_ONLY").contains("1")
    val allQueries = if (pipelineOnly) Seq.empty else SparkEntry.queries.toSeq.sortBy(_._1)
    // a failing query must NOT masquerade as a fast one (a missing sf dir
    // under spark-submit would otherwise record ~0s "timings" for the
    // whole board): failures surface on stderr and as -1 in the artifact
    def timeQuery(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t) / 1e9, ok)
    }
    allQueries.foreach { case (name, fn) => timeQuery(name, fn) } // warm, untimed
    val pass1 = allQueries.map { case (name, fn) => name -> timeQuery(name, fn) }
    val pass2 = allQueries.map { case (name, fn) => name -> timeQuery(name, fn) }.toMap
    val results = pass1.map { case (name, (t1, ok1)) =>
      val (t2, ok2) = pass2(name)
      // min over SUCCESSFUL passes only: an intermittent failure often
      // elapses near-zero and math.min over both would record the failed
      // rep's time as the query's timing
      val good = Seq((t1, ok1), (t2, ok2)).filter(_._2).map(_._1)
      name -> (if (good.isEmpty) -1.0 else good.min)
    }

    // late headline reps (several minutes after the early batch when the
    // query passes ran); overall min across both batches is the headline
    val late = (1 to 2).map(_ => timeRun())
    val (pipelineSec, done) = (early ++ late).minBy(_._1)
    val docsPerSec = done / pipelineSec

    val qs = (results :+ ("pipeline_e2e" -> pipelineSec))
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipelineSec
    println(
      f"""{"metric":"docs_per_sec_extract_correct","value":$docsPerSec%.1f,"unit":"docs/sec","total_sec":$total%.2f,"pipeline_docs":$done,"pipeline_sec":$pipelineSec%.3f,"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

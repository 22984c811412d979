package graft.tools

import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 from N to 4N executors), measured the fair way in a
  * sandbox with no real cluster:
  *
  *   - ONE JVM runs both levels, so JIT state, heap shape and page cache
  *     are identical (separate JVM runs differ 2-4x from compile storms).
  *   - The process is pinned with `taskset -p` to exactly N cores for the
  *     local[N] phase: an unpinned local[8] on a 32-core box borrows the
  *     other 24 cores for GC/JIT threads — help an 8-executor cluster
  *     would not have.
  *   - The two levels are INTERLEAVED (lo, hi, lo, hi, ...) and the
  *     efficiency is the median of per-pair ratios: this sandbox's hosts
  *     drift ~2x in throughput over minutes (noisy neighbors), so paired
  *     ratios cancel the drift where sequential best-of-k cannot.
  *
  * Prints one JSON line with per-level median docs/sec and the median
  * efficiency (docs/s@4N / docs/s@N) / 4.
  */
object ScalingBench {
  // CAVEAT (kept honest in the JSON output): `taskset -p` on a running
  // JVM re-pins existing threads, but GC/JIT service threads created at
  // startup may retain wider affinity on some kernels — the low-N phase
  // can be slightly flattered. The executor-faithful headline numbers
  // come from tools/bench_executors.sh (one JVM per "executor", pinned
  // at LAUNCH to disjoint cores); prefer those for BASELINE.md.
  private def pinTo(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("taskset", "-pc", s"0-${cores - 1}", pid.toString)
      .redirectErrorStream(true).start().waitFor()
  }

  private def withSession[A](cpus: Int)(f: SparkSession => A): A = {
    pinTo(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  /** One warmup pass INSIDE the session (each new session generates fresh
    * codegen classes that C2 must re-compile — that cost belongs to session
    * setup, not steady-state throughput), then the timed pass.
    */
  private def timeRun(spark: SparkSession, cpus: Int, nDocs: Long): Double = {
    Pipeline.run(Pipeline.generate(spark, nDocs, partitions = cpus * 4)).count()
    // best of 2 timed passes: this sandbox's host stalls for seconds at a
    // time (noisy neighbors); the min is the undisturbed measurement
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      Pipeline.run(Pipeline.generate(spark, nDocs, partitions = cpus * 4)).count()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toLong
    val pairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
    val hi = lo * 4

    // JIT warmup at both levels (full volume each)
    withSession(lo)(s => timeRun(s, lo, nDocs))
    withSession(hi)(s => timeRun(s, hi, nDocs))

    val results = (1 to pairs).map { _ =>
      val tLo = withSession(lo)(s => timeRun(s, lo, nDocs))
      val tHi = withSession(hi)(s => timeRun(s, hi, nDocs))
      (nDocs / tLo, nDocs / tHi, tLo / (4.0 * tHi))
    }
    val dLo = median(results.map(_._1))
    val dHi = median(results.map(_._2))
    val eff = median(results.map(_._3))
    val pairsStr = results.map(r => f"[${r._1}%.0f,${r._2}%.0f,${r._3}%.3f]")
      .mkString("[", ",", "]")
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","docs_per_sec_local$lo":$dLo%.1f,"docs_per_sec_local$hi":$dHi%.1f,"pairs":$pairsStr,"n_docs":$nDocs,"target":0.8,"pass":${eff >= 0.8},"note":"self-pinning leaves JVM service threads unpinned; prefer bench_executors.sh (launch-time taskset) as headline"}""")
  }
}

package graft.tools

/** Warm best-of-3 re-timer for individual SparkEntry queries — separates
  * real per-query cost from this host's multi-second noisy-neighbor
  * drift, which the serial one-pass Bench protocol conflates (see
  * BASELINE.md "Per-query notes").
  *
  * Usage: runMain graft.tools.ReTime q20_ann_topk q40_ann_ivf ...
  */
object ReTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n => graft.SparkEntry.queries(n)(spark, dir).count() } // warm
    args.foreach { n =>
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[retime] $n%-22s $best%.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.pipeline.Pipeline

/** GT-corpus-scale datapoint for the DISTRIBUTED Train fit (VERDICT r4
  * missing #1 / r5 top_next): run the full train — profile learning +
  * LE/RR/DM distributed fixed-point fits — at two corpus volumes and
  * report wall time per stage, for BASELINE.md. The expected shape:
  * the example-extraction pass is the volume-linear part; the per-epoch
  * gradient jobs are scheduling-latency-bound at these sizes, so total
  * fit wall grows far SUBLINEARLY in examples (the fixed epoch cost
  * amortizes as the corpus grows — the property that makes the
  * distributed fit viable at real GT scale where the old driver-side
  * collect would OOM first).
  *
  * Epochs default to the shipped-model setting (4000) — fewer epochs
  * fail Train's DM non-degeneracy guard and would misprice the fit.
  *
  * Usage: runMain graft.tools.TrainBench [pagesLo] [volumeFactor] [epochs]
  */
object TrainBench {
  def main(args: Array[String]): Unit = {
    val lo = args.lift(0).map(_.toLong).getOrElse(2000L)
    val factor = args.lift(1).map(_.toLong).getOrElse(4L)
    val epochs = args.lift(2).map(_.toInt).getOrElse(4000)
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def run(n: Long): (Long, Double) = {
      // start at page 1000: ids [500,700) are the hard-eval garble range
      // and [700,900) the misleading-correction range — training THROUGH
      // them poisons the DM calibration anchor (the weakest "positive"
      // is an uncorrectable garble) exactly as it would on un-curated GT
      import spark.implicits._
      val from = 1000L
      val pages = spark.range(from, from + n, 1L,
          spark.sparkContext.defaultParallelism)
        .map(i => graft.fixtures.PagesGen.page(i).row)
      val golden = Pipeline.goldenPages(spark, from, n)
      val nEx = Train.tokenExamples(pages, golden).count()
      val t0 = System.nanoTime()
      val model = Train.train(spark, pages, golden, epochs)
      val sec = (System.nanoTime() - t0) / 1e9
      require(model.rr.exists(_ != 0.0), "degenerate RR fit")
      (nEx, sec)
    }
    // warm pass (codegen + JIT) at the lo volume — a smaller warm corpus
    // would trip the DM non-degeneracy guard, and an UNwarmed lo pass
    // would inflate secLo and overstate the sublinearity ratio
    run(lo)
    val (exLo, secLo) = run(lo)
    val (exHi, secHi) = run(lo * factor)
    val ratio = secHi / secLo
    println(f"""{"bench":"train_scale","epochs":$epochs,"pages_lo":$lo,"examples_lo":$exLo,"wall_lo_sec":$secLo%.1f,"pages_hi":${lo * factor},"examples_hi":$exHi,"wall_hi_sec":$secHi%.1f,"volume_x":$factor,"wall_x":$ratio%.2f}""")
    spark.stop()
  }
}

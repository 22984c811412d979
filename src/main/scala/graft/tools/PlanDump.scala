package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plans/r06 before/after evidence trail. Not part of the bench
  * contract (Bench.scala is frozen); measurement stays in Bench/ReTime.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> q33_trigram_freq ...
  *        (no query args = all queries)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val qs = graft.SparkEntry.queries // def — build the map once
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else qs.keys.toSeq.sorted
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = qs(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // AQE finalizes exchange reuse / join rewrites only on execution —
      // append the executed plan so ReusedExchange and the final join
      // strategies are visible in the evidence files
      // collect(), not count(): count() plans a NEW QueryExecution, so
      // the df's own adaptive plan would never finalize (outputs are all
      // report-sized, so the collect is safe)
      val executed =
        try { df.collect(); df.queryExecution.executedPlan.toString }
        catch { case scala.util.control.NonFatal(e) =>
          s"<execution failed: ${e.getMessage}>" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        (plan + "\n\n== Executed plan (AQE final) ==\n" + executed)
          .getBytes("UTF-8"))
      println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}

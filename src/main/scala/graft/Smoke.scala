package graft


/** Flagship smoke runner: drives SparkEntry.entry the way the driver does
  * (rows > 0 check) and prints the corrected pages.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkBoot.session(cpus)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    df.show(5, truncate = 60)
    println(s"[smoke] entry rows=${rows.length} (driver requires > 0)")
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}

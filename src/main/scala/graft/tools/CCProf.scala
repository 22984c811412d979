package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level profile of q50's chain: band pairs -> CC (with round
  * count) -> histogram, warm best-of-3 per phase.
  */
object CCProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprof] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val q = graft.SparkEntry.queries("q50_dedup_clusters")
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      time("q50 end-to-end")(q(spark, dir).count())
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      val verts = docs.select(col("doc_id").as("id"))
      val edges0 = graft.operators.Dedup.minhashSig(
        docs.select(col("doc_id"), col("text")))
      val pairs = graft.operators.Dedup.minhashBandPairs(edges0, "doc_id")
        .select(col("id1").as("src"), col("id2").as("dst"))
      time("band pairs count")(println("  pairs=" + pairs.count()))
      val (comp, rounds) = time("CC total")(
        graft.operators.Dedup.connectedComponentsWithRounds(
          verts, pairs, edgesDistinct = true))
      println(s"  rounds=$rounds")
      time("histogram consume")(
        comp.groupBy(col("comp")).agg(count(lit(1))).count())
    }
    spark.stop()
  }
}

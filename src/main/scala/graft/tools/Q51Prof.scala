package graft.tools

/** Stage-level profile of the q51 corpus-prep chain. The pipeline's CC
  * fixpoint runs EAGERLY inside construction (it contains per-round
  * actions), so construction and the final collect are timed separately
  * — a q51 regression hides in whichever of the two grew.
  */
object Q51Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q51prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 4).foreach { pass =>
      println(s"--- pass $pass ---")
      val (ex, result) =
        time("construction (incl. eager CC)")(
          graft.SparkEntry.corpusPrepPipeline(spark, dir, persistEx = true))
      time("collect result")(result.collect())
      ex.unpersist()
    }

    import org.apache.spark.sql.functions._
    (1 to 3).foreach { pass =>
      println(s"=== manual pass $pass ===")
      val (ex, _) = graft.SparkEntry.corpusPrepPipeline(spark, dir, persistEx = true)
      // construction already materialized everything; unpersist and redo
      // stage by stage on a fresh copy
      ex.unpersist()
      val (ex2, _) = {
        val t0 = System.nanoTime()
        val r = graft.SparkEntry.corpusPrepPipeline(spark, dir, persistEx = true)
        println(f"[manual] re-construction          ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      ex2.unpersist()
      val surv = graft.SparkEntry.survivorsForProf(spark, dir).persist()
      time("ex materialize (count)")(surv.count())
      val edges = graft.SparkEntry.minhashEdgesForProf(surv)
      val sym = edges
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct().persist()
      time("sym materialize (count)")(sym.count())
      val labels = sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")).persist()
      time("labels materialize")(labels.count())
      time("init agg")(labels.agg(sum(col("comp").cast("decimal(38,0)"))).first())
      surv.unpersist(); sym.unpersist(); labels.unpersist()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Volume-linearity datapoint for the q64 chunk-dedup shape (C4-style
  * corpus-wide span dedup): synthesize N docs whose 8-token chunks are
  * drawn from a bounded phrase pool (so cross-document chunk collisions
  * are plentiful, like boilerplate on the web), run the exact q64
  * operator chain ([[graft.SparkEntry.chunkKeepFlags]], shared — not a
  * copy — so the recorded numbers can't drift from the product), and
  * report wall time + drop rate at each requested volume.
  * Deterministic: every doc is a pure function of its index.
  *
  * Usage: runMain graft.tools.ChunkDedupBench [nDocs[,nDocs2,...]]
  */
object ChunkDedupBench {
  def main(args: Array[String]): Unit = {
    val volumes = args.lift(0).getOrElse("200000,800000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = graft.SparkBoot.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def run(n: Long): (Double, Long, Long) = {
      // 12 chunks/doc; each chunk is one of 2^17 pooled phrases plus a
      // per-position salt word so ~half the chunks are pool-repeats and
      // half are unique — a boilerplate-heavy web mix
      val docs = spark.range(0L, n).toDF("doc_id")
        .withColumn("text", concat_ws(" ", (0 until 12).flatMap { c =>
          val pool = pmod(xxhash64(col("doc_id"), lit(c)), lit(131072L))
          (0 until 7).map(w => concat(lit(s"p${c}w${w}x"), pool)) :+
            when(pmod(xxhash64(col("doc_id"), lit(c + 100)), lit(2)) === 0,
              concat(lit("u"), col("doc_id") * 12 + c)).otherwise(lit("common"))
        }: _*))
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.chunkKeepFlags(docs)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("keep"), 1)).as("n_kept"))
        .agg(coalesce(sum(col("n_chunks")), lit(0L)),
          coalesce(sum(col("n_kept")), lit(0L))).first()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }

    run(math.max(volumes.head / 4, 1L)) // warm codegen at a small volume, untimed
    volumes.foreach { n =>
      val (sec, chunks, kept) = run(n)
      println(f"""{"bench":"chunk_dedup","docs":$n,"chunks":$chunks,"kept":$kept,"wall_sec":$sec%.2f,"docs_per_sec":${n / sec}%.0f}""")
    }
    spark.stop()
  }
}

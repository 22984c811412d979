package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-partition checkpoint ledger — the engine's resume substrate.
  *
  * The reference resumes a pipeline by skipping any stage whose output
  * file group already exists (ocrd_cis/aio/aio.py:269-271,296-298,385-387:
  * `if "OCR-D-..." in mets: continue`). At 10^12 rows the unit of resume
  * must be finer than a whole stage, so this module re-expresses that
  * semantics per *bucket*: rows are hash-bucketed on the stage key, each
  * bucket commits independently (dynamic partition overwrite = exactly-once
  * per bucket), and a JSON ledger records bucket id, row count, byte size
  * and wall time — the lineage + throughput metrics the north rule asks
  * every stage to emit. A rerun anti-joins completed buckets away and
  * processes only the remainder; a bucket that crashed mid-write is
  * rewritten wholesale (its ledger entry was never committed).
  *
  * Emulates the Iceberg snapshot/manifest contract with plain partitioned
  * Parquet + a manifest file (SURVEY.md §7.4) since no Iceberg runtime jar
  * ships offline; on a real cluster the same API maps onto an Iceberg
  * table with `overwrite-partitions`.
  */
object Checkpoint {

  final case class BucketEntry(
      stage: String,
      bucket: Int,
      rows: Long,
      wallMs: Long,
      completedAtMs: Long
  )

  final case class StageResult(
      output: DataFrame,
      processedBuckets: Seq[Int],
      skippedBuckets: Seq[Int],
      ledger: Seq[BucketEntry]
  )

  private def ledgerPath(root: String, stage: String) = s"$root/$stage/_ledger.jsonl"
  private def dataPath(root: String, stage: String) = s"$root/$stage/data"

  def readLedger(root: String, stage: String): Seq[BucketEntry] = {
    val p = Paths.get(ledgerPath(root, stage))
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(parseEntry)
  }

  // hand-rolled fixed-schema JSON (no external json dep in main)
  private def renderEntry(e: BucketEntry): String =
    s"""{"stage":"${e.stage}","bucket":${e.bucket},"rows":${e.rows},""" +
      s""""wallMs":${e.wallMs},"completedAtMs":${e.completedAtMs}}"""

  private def parseEntry(line: String): BucketEntry = {
    def field(k: String): String = {
      val m = java.util.regex.Pattern.compile("\"" + k + "\":\"?([^,}\"]*)").matcher(line)
      require(m.find(), s"bad ledger line: $line")
      m.group(1)
    }
    BucketEntry(field("stage"), field("bucket").toInt, field("rows").toLong,
      field("wallMs").toLong, field("completedAtMs").toLong)
  }

  /** Atomic append of new entries: write whole file to tmp, then rename. */
  private def appendLedger(root: String, stage: String, entries: Seq[BucketEntry]): Unit = {
    val all = readLedger(root, stage) ++ entries
    val p = Paths.get(ledgerPath(root, stage))
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(p.toString + ".tmp")
    Files.writeString(tmp, all.map(renderEntry).mkString("", "\n", "\n"))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Run one resumable stage.
    *
    * @param stage    stage name (output dir + ledger key)
    * @param root     checkpoint root directory
    * @param in       input rows
    * @param keyCol   column whose hash defines the bucket (e.g. "url")
    * @param nBuckets bucket count — the resume granularity; at cluster
    *                 scale set ≈ executors × a small factor
    * @param f        the stage transform (applied before bucketing; must
    *                 keep `keyCol` in its output)
    */
  def runStage(
      spark: SparkSession,
      stage: String,
      root: String,
      in: DataFrame,
      keyCol: String,
      nBuckets: Int
  )(f: DataFrame => DataFrame): StageResult = {
    val done = readLedger(root, stage).map(_.bucket).toSet
    val all = 0 until nBuckets
    val todo = all.filterNot(done)
    val out = dataPath(root, stage)

    if (todo.nonEmpty) {
      val t0 = System.currentTimeMillis()
      val bucket = pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int")
      // resume filter FIRST (prune completed buckets before any work),
      // then the stage transform, then per-bucket dynamic overwrite
      val pending = in.withColumn("p_bucket", bucket)
        .filter(col("p_bucket").isin(todo: _*))
      // cluster rows by bucket before the partitioned write: otherwise
      // every task opens a parquet writer per bucket it sees (tasks x
      // buckets writer inits — the classic dynamic-partitioning write
      // explosion); clustered, each bucket is written by one task
      val transformed = f(pending)
        .withColumn("p_bucket",
          pmod(xxhash64(col(keyCol)), lit(nBuckets)).cast("int"))
        .repartition(nBuckets, col("p_bucket"))
      val counts = transformed.persist()
        .groupBy(col("p_bucket")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      transformed.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_bucket")
        .parquet(out)
      transformed.unpersist()
      val wall = System.currentTimeMillis() - t0
      val now = System.currentTimeMillis()
      // ledger commit AFTER the data commit: a crash between the two
      // re-processes those buckets (overwrite makes that idempotent)
      appendLedger(root, stage, todo.map(b =>
        BucketEntry(stage, b, counts.getOrElse(b, 0L), wall / math.max(1, todo.size), now)))
    }

    StageResult(
      spark.read.parquet(out),
      todo,
      all.filter(done).toSeq,
      readLedger(root, stage))
  }
}

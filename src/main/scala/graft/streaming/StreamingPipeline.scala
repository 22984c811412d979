package graft.streaming

import graft.core.{CorrectedPage, PageRow}
import graft.fixtures.PagesGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Structured Streaming front-end for the extraction pipeline.
  *
  * The reference is pure batch (SURVEY §1.2: no streaming abstraction
  * exists), so parity does not require this — but the pipeline is a
  * narrow, stateless map chain, which means the SAME stage functions run
  * unchanged under `readStream`: micro-batches of pages stream through
  * segment -> align -> correct with no watermark or state store needed.
  * This is the continuous-ingest mode a crawl feed would use; per-batch
  * output commits give the same resume granularity as the batch ledger
  * (the sink's checkpointLocation replaces the bucket ledger).
  */
object StreamingPipeline {

  /** Streaming source of synthetic pages: the `rate` source's monotonically
    * increasing `value` is the page index, so the stream deterministically
    * reproduces the batch corpus (same golden truth per url).
    */
  def pagesStream(spark: SparkSession, rowsPerSecond: Int = 1000): Dataset[PageRow] = {
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .load()
      .select("value").as[Long]
      .map(i => PagesGen.page(i).row)
  }

  /** The streaming pipeline: identical stage functions as batch. */
  def corrected(pages: Dataset[PageRow]): Dataset[CorrectedPage] =
    Pipeline.correct(Pipeline.align(Pipeline.segment(pages)))

  /** Parquet sink with exactly-once micro-batch commits. */
  def writer(
      out: Dataset[CorrectedPage],
      path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[CorrectedPage] =
    out.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}

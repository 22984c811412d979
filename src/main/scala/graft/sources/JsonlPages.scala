package graft.sources

import graft.core.PageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL crawl-feed ingestion — the delivery format a Common-Crawl-style
  * corpus actually arrives in before it becomes the Pages table
  * (newline-delimited JSON per page, html shipped base64; the WET/WARC
  * sidecar-to-table step). The reference's counterpart is the bagit/zip
  * workspace ingest (tests/test_lib.bash:7-18); here the web shape is a
  * splittable JSONL scan.
  *
  * Scale design:
  *  - schema is DECLARED, never inferred — inference is a second full
  *    pass over 100 TB and silently widens types per run;
  *  - PERMISSIVE mode with a corrupt-record column: a crawl feed always
  *    contains broken lines, and one bad record must not kill a
  *    1000-executor job (contrast segmentLayoutOpt's per-row tolerance);
  *    broken/incomplete rows are QUARANTINED into a second dataset the
  *    caller can count, sample, and land next to the run's metrics —
  *    dropped-data visibility is part of the lineage contract;
  *  - JSONL is line-splittable, so the scan parallelizes like text.
  */
object JsonlPages {

  /** Declared feed schema. `_corrupt_record` captures unparseable lines. */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", StringType), // ISO-8601 UTC instant
    StructField("html_b64", StringType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("_corrupt_record", StringType)
  ))

  /** Parsed feed: the good pages, the quarantined rows, and the shared
    * parse cache. `pages` and `quarantine` both derive from one cached
    * JSON parse; call [[unpersist]] after landing both outputs — the
    * cache is NOT leaked-by-design, its lifetime belongs to the caller
    * (a per-feed ingest job lands pages + quarantine, then drops it).
    */
  final case class Feed(pages: Dataset[PageRow], quarantine: DataFrame,
      private val raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  /** Parse a JSONL feed.
    *
    * Quarantined rows: unparseable JSON lines, plus parseable rows
    * missing url/warc_ts/html_b64 or whose timestamp/base64 does not
    * decode (`try_to_timestamp` / `try_to_binary(..., 'base64')` turn
    * bad values into NULLs instead of failing the task — `unbase64`
    * would THROW on truncated input and silently emit garbage bytes for
    * non-alphabet input). The quarantine frame keeps the raw line (or
    * the partial parse) so failures are debuggable downstream.
    */
  def read(spark: SparkSession, path: String): Feed = {
    import spark.implicits._
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("ts", expr("try_to_timestamp(warc_ts)"))
      .withColumn("html", expr("try_to_binary(html_b64, 'base64')"))
      .cache()

    val ok = col("_corrupt_record").isNull &&
      col("url").isNotNull && col("ts").isNotNull && col("html").isNotNull
    val pages = raw.filter(ok)
      .select(col("url"), col("ts").as("warc_ts"), col("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .as[PageRow]
    val quarantine = raw.filter(!ok)
      .select(col("_corrupt_record"), col("url"), col("warc_ts"), col("html_b64"))
    Feed(pages, quarantine, raw)
  }
}

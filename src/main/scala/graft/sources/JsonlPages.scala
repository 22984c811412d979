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

  /** Parse a JSONL feed into (pages, quarantine).
    *
    * Quarantined rows: unparseable JSON lines, plus parseable rows
    * missing url/warc_ts/html_b64 or whose timestamp/base64 does not
    * decode. The quarantine frame keeps the raw line (or the partial
    * parse) so failures are debuggable downstream.
    */
  def read(spark: SparkSession, path: String): (Dataset[PageRow], DataFrame) = {
    import spark.implicits._
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // try_to_timestamp keeps a bad timestamp as NULL instead of failing
      // the task under ANSI mode; unbase64 is lenient by construction
      .withColumn("ts", expr("try_to_timestamp(warc_ts)"))
      .withColumn("html", unbase64(col("html_b64")))
      .cache()

    val ok = col("_corrupt_record").isNull &&
      col("url").isNotNull && col("ts").isNotNull && col("html_b64").isNotNull
    val pages = raw.filter(ok)
      .select(col("url"), col("ts").as("warc_ts"), col("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .as[PageRow]
    val quarantine = raw.filter(!ok)
      .select(col("_corrupt_record"), col("url"), col("warc_ts"), col("html_b64"))
    (pages, quarantine)
  }
}

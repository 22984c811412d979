package graft.sources

import graft.core.{GoldenPage, PageRow}
import org.apache.spark.sql.{Dataset, SparkSession}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Local GT-archive ingest — the role of the reference's bagit/zip corpus
  * unpacker (aio/aio.py:31-59 `unpack`, 142-236 archive-to-workspace
  * rewrite), offline-legal: no wget, archives are local files read
  * through the Hadoop FS API.
  *
  * Archive layout (a minimal bagit profile):
  * {{{
  *   bagit.txt               marker ("BagIt-Version: 0.97")
  *   manifest-md5.txt        "<md5hex>  <entryName>" per data/ payload
  *   data/meta.tsv           "<k>\t<url>\t<warc_ts micros>\t<lang>\t<text hint>"
  *   data/pages/<k>.html     raw page bytes
  *   data/golden/<k>.txt     golden text (optional per k — GT-annotated
  *                           pages only, like the reference's GT groups)
  * }}}
  *
  * Scale shape: `spark.read.format("binaryFile")` lists the archives (one
  * row per zip, driver never opens them); each TASK expands its archive
  * from the byte stream with ZipInputStream and md5-verifies every
  * payload against the manifest (the bagit fixity contract — corruption
  * fails loudly, never yields a silent wrong page). One task per archive
  * mirrors the reference's per-bagit unpack loop and parallelizes across
  * a crawl-sized archive collection; individual archives are
  * GT-workspace-sized (the reference's are 3-page bags), so per-task
  * memory is bounded by the largest single archive.
  */
object ArchiveIngest {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** All entries of one zip archive byte stream, name -> bytes. */
  private def entriesOf(zipBytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val buf = new ByteArrayOutputStream()
        zin.transferTo(buf)
        out += e.getName -> buf.toByteArray
      }
      zin.closeEntry()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Parse + fixity-check one archive into (PageRow, Option[golden]). */
  private[sources] def readArchive(name: String,
      zipBytes: Array[Byte]): Seq[(PageRow, Option[String])] = {
    val entries = entriesOf(zipBytes)
    require(entries.contains("bagit.txt"), s"$name: not a bagit archive (no bagit.txt)")
    val manifest = new String(entries.getOrElse("manifest-md5.txt",
      sys.error(s"$name: missing manifest-md5.txt")), Utf8)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val (sum, path) = line.splitAt(line.indexOf(' '))
        sum -> path.trim
      }.map(_.swap).toMap
    // fixity: every payload listed, every listed payload present + intact
    entries.keys.filter(_.startsWith("data/")).foreach { p =>
      val want = manifest.getOrElse(p, sys.error(s"$name: $p not in manifest"))
      val got = md5hex(entries(p))
      require(got == want, s"$name: fixity failure on $p ($got != $want)")
    }
    manifest.keys.foreach(p =>
      require(entries.contains(p), s"$name: manifest lists missing $p"))
    val meta = new String(entries.getOrElse("data/meta.tsv",
      sys.error(s"$name: missing data/meta.tsv")), Utf8)
    meta.linesIterator.filter(_.nonEmpty).map { line =>
      val f = line.split("\t", -1)
      require(f.length == 5, s"$name: bad meta.tsv line '$line'")
      val k = f(0)
      val html = entries.getOrElse(s"data/pages/$k.html",
        sys.error(s"$name: missing data/pages/$k.html"))
      val row = PageRow(f(1), new java.sql.Timestamp(f(2).toLong / 1000L),
        html, f(4), f(3))
      (row, entries.get(s"data/golden/$k.txt").map(new String(_, Utf8)))
    }.toSeq
  }

  /** Pages of every archive matching `glob` (a path, directory or glob
    * the binaryFile source accepts).
    */
  def pages(spark: SparkSession, glob: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => readArchive(p, bytes).map(_._1) }
  }

  /** GT table of every archive matching `glob`: the (url, golden) shape
    * training/eval join on (Pipeline.goldenPages contract).
    */
  def golden(spark: SparkSession, glob: String): Dataset[GoldenPage] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        readArchive(p, bytes).collect { case (row, Some(g)) => GoldenPage(row.url, g) }
      }
  }

  /** Write one archive (fixture/export side — driver-sized, like the
    * reference's bagit builders). `text` hints must not contain tabs or
    * newlines (meta.tsv is tab-separated); asserts rather than corrupts.
    */
  def writeArchive(path: String,
      rows: Seq[(PageRow, Option[String])]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    val zos = new ZipOutputStream(out)
    val manifest = new StringBuilder
    def put(name: String, bytes: Array[Byte], payload: Boolean): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
      if (payload) manifest.append(md5hex(bytes)).append("  ").append(name).append('\n')
    }
    val meta = new StringBuilder
    rows.zipWithIndex.foreach { case ((row, gold), k) =>
      require(!row.text.exists(c => c == '\t' || c == '\n'),
        s"text hint of ${row.url} contains tab/newline — not meta.tsv-safe")
      meta.append(k).append('\t').append(row.url).append('\t')
        .append(row.warc_ts.getTime * 1000L).append('\t')
        .append(row.lang).append('\t').append(row.text).append('\n')
      put(s"data/pages/$k.html", row.html, payload = true)
      gold.foreach(g => put(s"data/golden/$k.txt", g.getBytes(Utf8), payload = true))
    }
    put("data/meta.tsv", meta.toString.getBytes(Utf8), payload = true)
    put("bagit.txt", "BagIt-Version: 0.97\nTag-File-Character-Encoding: UTF-8\n"
      .getBytes(Utf8), payload = false)
    put("manifest-md5.txt", manifest.toString.getBytes(Utf8), payload = false)
    zos.close()
  }
}

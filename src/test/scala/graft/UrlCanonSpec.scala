package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q71's URL canonicalizer: handcrafted adversarial cases plus the
  * canonicalizer's defining property — idempotency. A non-idempotent
  * canonicalizer silently re-mangles already-ingested urls on every
  * recrawl (the classic frontier-dedup bug), so canon(canon(u)) must
  * equal canon(u) on every input shape, not just the synthetic corpus.
  */
class UrlCanonSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(SparkEntry.canonicalizeUrl(col("u"))).as[String].collect().toSeq
  }

  test("handcrafted cases") {
    val cases = Seq(
      "HTTP://Example.COM:80/a/" -> "http://example.com/a",
      "https://example.com/a?utm_source=x" -> "https://example.com/a",
      "https://example.com/a?utm_source=x&id=1" -> "https://example.com/a?id=1",
      "https://example.com/a?id=1&utm_medium=y" -> "https://example.com/a?id=1",
      "https://example.com/a?utm_a=1&utm_b=2&id=3" -> "https://example.com/a?id=3",
      "https://example.com/a#frag" -> "https://example.com/a",
      "https://example.com/a/?id=1#frag" -> "https://example.com/a?id=1",
      // :8080 is NOT the default port and must survive
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // 80 is only http's default; https:80 is a DIFFERENT origin
      "https://example.com:80/a" -> "https://example.com:80/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:443/a" -> "http://example.com:443/a",
      // an '&' that was in the path all along must NOT become a query
      "http://example.com/a&b" -> "http://example.com/a&b",
      "http://example.com/a&b?id=1" -> "http://example.com/a&b?id=1",
      // path-& plus a dropped '?' utm param: the '&' still stays a path char
      "http://example.com/a&b?utm_s=1" -> "http://example.com/a&b",
      "http://example.com/a&b?utm_s=1&id=2" -> "http://example.com/a&b?id=2",
      // trailing slash RUNS collapse in one pass (idempotency)
      "http://example.com/a//" -> "http://example.com/a",
      "http://example.com/a//?id=1" -> "http://example.com/a?id=1",
      // already-canonical urls flow through unchanged
      "https://example.com/a?id=1" -> "https://example.com/a?id=1")
    assert(canon(cases.map(_._1)) == cases.map(_._2))
  }

  test("idempotent on fuzzed url shapes") {
    val rng = new scala.util.Random(11)
    val schemes = Seq("http", "HTTP", "https", "HtTpS")
    val hosts = Seq("a.b.c", "WWW.X.COM", "h-1.example.org")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/p", "/p/q", "/p/q/", "/p//", "/a&b", "/a&b/")
    val queries = Seq("", "?id=1", "?utm_s=1", "?utm_s=1&id=2",
      "?id=2&utm_s=1", "?utm_a=1&utm_b=2", "?x=1&utm_m=2&y=3")
    val frags = Seq("", "#f", "#sec2")
    val urls = (1 to 200).map { _ =>
      schemes(rng.nextInt(schemes.size)) + "://" +
        hosts(rng.nextInt(hosts.size)) + ports(rng.nextInt(ports.size)) +
        paths(rng.nextInt(paths.size)) + queries(rng.nextInt(queries.size)) +
        frags(rng.nextInt(frags.size))
    }
    val once = canon(urls)
    val twice = canon(once)
    val diverging = once.zip(twice).zip(urls).collect {
      case ((a, b), raw) if a != b => s"$raw -> $a -> $b"
    }
    assert(diverging.isEmpty, s"non-idempotent on:\n${diverging.mkString("\n")}")
  }
}

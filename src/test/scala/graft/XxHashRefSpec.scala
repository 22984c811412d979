package graft

import org.scalatest.funsuite.AnyFunSuite

class XxHashRefSpec extends AnyFunSuite {
  test("independent XXH64 matches Spark's xxhash64 on strings") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = (0 until 64).map(i => graft.fixtures.PagesGen.page(i.toLong).row.url) ++
      Seq("", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
        "the quick brown fox jumps over the lazy dog and more bytes!")
    val got = samples.toDF("s").select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(graft.fixtures.XxHash64Ref.sparkHash(s) == got(s), s"mismatch for '$s'")
    }
  }
}

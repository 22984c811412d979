package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("connected components: chains merge transitively, singletons survive") {
    import spark.implicits._
    // 0-1-2-3-4 chain (diameter 4 -> needs multiple propagation rounds),
    // 5-6 pair, 7 isolated; edges given one-directional and unsorted
    val verts = (0L to 7L).toDF("id")
    val edges = Seq((3L, 4L), (1L, 0L), (2L, 3L), (1L, 2L), (6L, 5L))
      .toDF("src", "dst")
    val comp = Dedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).forall(comp(_) == 0L), comp.toString)
    assert(comp(5L) == 5L && comp(6L) == 5L)
    assert(comp(7L) == 7L)
  }

  test("connected components: throws rather than returning a non-fixpoint") {
    import spark.implicits._
    val verts = (0L to 9L).toDF("id")
    val edges = (0L to 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      // diameter 9 cannot converge in 2 rounds
      Dedup.connectedComponents(verts, edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("converge"))
  }
}

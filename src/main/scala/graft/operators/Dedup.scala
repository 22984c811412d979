package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER formation — the step between candidate-pair
  * generation (MinHash/SimHash band joins, SparkEntry q18/q44) and the
  * actual dedup decision: keep one document per connected component of
  * the similarity graph. The reference's corpus tooling stops at
  * file-group granularity (aio/aio.py unpacks and aligns whole groups);
  * at web scale the same "one survivor per duplicate set" semantics is a
  * connected-components problem over 10^9+ edges.
  *
  * Algorithm: iterative minimum-label propagation (the alternating
  * star-contraction family — see the small-star/large-star formulation
  * used by large-scale CC systems). Each round every vertex adopts the
  * smallest label in its closed neighborhood; rounds repeat until a
  * fixpoint. Convergence needs O(graph diameter) rounds — near-dup
  * graphs are dense clique-ish clusters with tiny diameters, so a handful
  * of rounds suffices; `maxRounds` bounds the worst case and the method
  * throws rather than returning a non-fixpoint labeling.
  *
  * Scale shape per round: one equi-join (labels x edges, both hash
  * partitioned on the join key) + one min-aggregation — no driver-side
  * graph state, labels persisted across rounds so each iteration reads
  * the previous materialization instead of recomputing the lineage chain.
  */
object Dedup {

  /** Connected components over an undirected edge list.
    *
    * @param vertices one column `id` (BIGINT) — every document, including
    *                 isolated ones (they become singleton clusters)
    * @param edges    columns `src`, `dst` (BIGINT), undirected; need not
    *                 be symmetrized
    * @return (id, comp) — comp is the minimum vertex id of the component
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxRounds: Int = 20
  ): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = vertices.select(col("id"), col("id").as("comp")).persist()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // neighborhood minimum: labels flow across every edge, then each
      // vertex keeps the min of (its label, incoming labels)
      val viaEdges = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(viaEdges)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .persist()
      // one count materializes `next` AND detects the fixpoint
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .filter(col("n.comp") =!= col("l.comp"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      round += 1
    }
    sym.unpersist()
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds — " +
        "graph diameter exceeds the bound; raise maxRounds")
    labels
  }
}

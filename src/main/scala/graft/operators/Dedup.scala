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
  * used by large-scale CC systems) restricted to EDGE ENDPOINTS — at web
  * scale the overwhelming majority of documents touch no candidate pair,
  * and looping over them would shuffle the whole corpus every round for
  * nothing; isolated vertices join as singleton components after the
  * fixpoint, via one anti-join. Each round every endpoint adopts the
  * smallest label in its closed neighborhood; labels decrease
  * monotonically, so the fixpoint test is "did the label sum change" —
  * one aggregate per round (summed as DECIMAL so 10^12 64-bit ids cannot
  * overflow), not a self-join against the previous labels.
  *
  * Convergence needs O(graph diameter) rounds — near-dup graphs are
  * dense clique-ish clusters with tiny diameters, so a handful of rounds
  * suffices; `maxRounds` bounds the worst case and the method throws
  * rather than returning a non-fixpoint labeling.
  */
object Dedup {

  /** Two-lane commutative multiset fingerprint columns (fp1, fp2) over
    * `text` — the exact-dedup key (SparkEntry q15/q51 and the production
    * Run dedup stage). Lane i sums 48-bit md5 slices (chars 1-12 /
    * 13-24) mod a distinct ~2^61/2^60 prime, reducing mod p at every
    * addition step (a < p, x < 2^48, so a + x never overflows int64).
    * Modular addition is commutative and map-side combinable; the pair
    * key lives in a ~2^121 space, so at 10^12 docs the birthday
    * collision mass is ~10^24 * 2^-121 ~= 4e-13.
    */
  def fingerprintLanes(docs: DataFrame): DataFrame = {
    def lane(from: Int, p: String) =
      s"""aggregate(
         |  transform(split(text, ' '),
         |    t -> cast(conv(substring(md5(to_binary(t, 'utf-8')), $from, 12), 16, 10) as bigint)),
         |  cast(0 as bigint), (a, x) -> pmod(a + x, ${p}L))""".stripMargin
    docs
      .withColumn("fp1", expr(lane(1, "2305843009213693951")))
      .withColumn("fp2", expr(lane(13, "1152921504606846883")))
  }

  /** 8-hash MinHash signature columns h0..h7 appended to `docs` (which
    * must carry `text`) — ONE definition shared by the query board
    * (q18/q51 via SparkEntry) and the production Run near-dup stage.
    * Row-local projection (the graft_minhash8 codegen kernel): no
    * shuffle, no explode.
    */
  def minhashSig(docs: DataFrame): DataFrame = {
    graft.functions.MinhashSig.register(docs.sparkSession)
    docs
      .withColumn("_mh", expr("graft_minhash8(text)"))
      .select(docs.columns.toIndexedSeq.map(col) ++
        (0 to 7).map(j => col("_mh").getItem(j).as(s"h$j")): _*)
  }

  /** B=4×R=2 band equi-join candidate pairs over a frame already
    * carrying h0..h7: DISTINCT (id1, id2) with id1 < id2 under the
    * df≤`dfGuard` hot-band guard (default 128 — the constant the oracle
    * board mirrors; the production Run surface overrides it via
    * `--neardup-df-guard`). The windowed df count shares the (band, key)
    * shuffle the self-join needs anyway, so signatures are computed
    * exactly once (ReusedExchange asserted in PlanAuditSpec).
    */
  def minhashBandPairs(sig: DataFrame, idCol: String,
      dfGuard: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def md5s(c: org.apache.spark.sql.Column) = md5(to_binary(c, lit("utf-8")))
    val banded0 = sig.select(col(idCol), posexplode(array(
      md5s(concat(col("h0"), col("h1"))), md5s(concat(col("h2"), col("h3"))),
      md5s(concat(col("h4"), col("h5"))), md5s(concat(col("h6"), col("h7")))
    ))).toDF(idCol, "band", "key")
    val wDf = Window.partitionBy(col("band"), col("key"))
    val banded = banded0.withColumn("df", count(lit(1)).over(wDf))
      .filter(col("df") <= dfGuard).drop("df")
    val a = banded.select(col("band"), col("key"), col(idCol).as("id1"))
    // pin the self-join to sort-merge: both sides are the same
    // corpus-sized banded frame (broadcast can never fire at production
    // scale), and the hint makes the tiny-sf plan match the at-scale one
    // — both sides reuse the ONE Exchange(band, key) the df-guard window
    // already paid (ReusedExchange, PlanAuditSpec), whose sort also
    // satisfies SMJ's ordering; left to the planner the small build side
    // broadcast and re-evaluated the whole signature+window chain.
    val b = banded.select(col("band"), col("key"), col(idCol).as("id2"))
      .hint("merge")
    a.join(b, Seq("band", "key")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  /** Corpus-global near-dup keeper labels over (url, text) rows — the
    * production composition of the individually-oracled q18 (band
    * pairs) and q50 (connected components): representative = MIN url
    * per similarity component, returned as ONLY the strict duplicates
    * (url != rep) in (url, nd_dup_of) form, so the labels table is
    * bounded by the duplicate mass, not the corpus.
    *
    * CC runs on xxhash64(url) vertex ids with a LOUD distinct-count
    * collision guard: birthday mass is n²/2^65 (~3e-5 at 10^9 docs), and
    * a collision fails the job rather than silently merging two
    * unrelated clusters. Input rows sharing a url (double-crawls) map to
    * one vertex and thus one label, which is what a url-keyed flag join
    * wants. `docs` should be a cheap re-scannable source (a committed
    * stage table): the derivation scans it for signatures, the vertex
    * set and the id→url map.
    */
  def nearDupLabels(docs: DataFrame, dfGuard: Int = 128): DataFrame = {
    val withId = vertexIds(docs, "nearDupLabels")
    val pairs = minhashBandPairs(
      minhashSig(withId.select(col("doc_id"), col("text"))), "doc_id", dfGuard)
    labelsFromPairs(withId, pairs.toDF("src", "dst"))
  }

  /** Semantic near-dup keeper labels (the SemDedup strategy, q82's
    * shape at production): hashed-tf embeddings, k=⌈√n⌉ seed centroids
    * (the k smallest vertex ids — a bounded top-k, not a sort), row-local
    * broadcast-centroid argmin cells, within-cell pairs under the
    * ≤`cellCap`-docs/cell skew guard (the SAME knob the minhash strategy
    * spends on its band-df guard), exact graft_cosine ≥ `tau` verify,
    * then the same CC → min-url representative → strict-dups-only (url,
    * nd_dup_of) contract as [[nearDupLabels]]. Catches paraphrase-level
    * duplicates MinHash token shingles miss; trades the band join's
    * near-lossless recall for cell-bounded probe cost (the q82 gate
    * scores exactly this trade against exact truth).
    */
  def semDedupLabels(docs: DataFrame, tau: Double = 0.97,
      cellCap: Int = 128): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.CosineSim.register(spark)
    graft.functions.HashTf.register(spark)
    val withId = vertexIds(docs, "semDedupLabels")
    // ONE embedding row per vertex: a url re-crawled with CHANGED text
    // survives exact dedup twice under one vertex id — embed the MIN
    // text (deterministic pick; partition-order dropDuplicates is not)
    // so seed selection, cells and pairs are stable across a
    // crash-before-marker labels recompute, and the cell partition's
    // pair set stays distinct-by-construction (the edgesDistinct
    // premise below)
    val oneText = withId.groupBy(col("doc_id"), col("url"))
      .agg(min(col("text")).as("text"))
    val n = oneText.count()
    val k = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val emb = oneText.select(col("doc_id"),
      expr("graft_hashtf(split(text, ' '))").as("v"))
    val centArr = VectorOps.centroidArray(
      emb.orderBy(col("doc_id")).limit(k)
        .select(col("doc_id").as("cid"), col("v").as("cv")))
    val assigned = emb.crossJoin(broadcast(centArr))
      .withColumn("ds", VectorOps.distRank)
      .select(col("doc_id"), col("v"), expr("ds[0].cid").as("cid"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val inCell = assigned.withColumn("csz", count(lit(1)).over(wc))
      .filter(col("csz") <= cellCap).drop("csz")
    val a = inCell.select(col("cid"), col("doc_id").as("src"), col("v").as("v1"))
    // merge-pinned cell self-join: both sides reuse the cell-cap
    // window's Exchange(cid) + sort (see minhashBandPairs)
    val b = inCell.select(col("cid"), col("doc_id").as("dst"), col("v").as("v2"))
      .hint("merge")
    val pairs = a.join(b, Seq("cid")).filter(col("src") < col("dst"))
      .filter(expr("graft_cosine(v1, v2)") >= tau)
      .select(col("src"), col("dst"))
    labelsFromPairs(withId, pairs)
  }

  /** Shared vertex-id derivation for the labels strategies: one
    * xxhash64(url) vertex per url with a LOUD distinct-count collision
    * guard — birthday mass is n²/2^65 (~3e-5 at 10^9 docs), and a
    * collision fails the job rather than silently merging two unrelated
    * clusters. Rows sharing a url (double-crawls) map to one vertex and
    * thus one label, which is what a url-keyed flag join wants.
    */
  private def vertexIds(docs: DataFrame, who: String): DataFrame = {
    val withId = docs.select(col("url"), col("text"))
      .withColumn("doc_id", xxhash64(col("url")))
    val guard = withId
      .agg(countDistinct(col("url")).as("u"), countDistinct(col("doc_id")).as("d"))
      .first()
    require(guard.getLong(0) == guard.getLong(1),
      s"$who: xxhash64(url) collision (${guard.getLong(0)} urls -> " +
        s"${guard.getLong(1)} ids) — two distinct urls share a vertex id; " +
        "a 64-bit id space is exhausted at this corpus size, widen the key")
    withId
  }

  /** Shared labels tail for the strategies: CC over DISTINCT (src, dst)
    * candidate pairs (both producers end distinct-by-construction —
    * minhashBandPairs' explicit distinct, the cell partition's disjoint
    * pairing), representative = MIN url per component, strict duplicates
    * only (url != rep) as (url, nd_dup_of) — ONE definition so the two
    * strategies' labels contract can never diverge.
    */
  private def labelsFromPairs(withId: DataFrame, pairs: DataFrame): DataFrame = {
    val verts = withId.select(col("doc_id").as("id")).distinct()
    val comp = connectedComponents(verts, pairs, edgesDistinct = true)
    val byId = withId.select(col("doc_id").as("id"), col("url")).distinct()
    val labeled = comp.join(byId, Seq("id"))
    val reps = labeled.groupBy(col("comp")).agg(min(col("url")).as("nd_dup_of"))
    labeled.join(reps, Seq("comp"))
      .filter(col("url") =!= col("nd_dup_of"))
      .select(col("url"), col("nd_dup_of"))
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  @volatile private var warnedLocalFallback = false

  /** Rounds the last [[connectedComponents]] call on this JVM took —
    * diagnostic convenience ONLY, racy under concurrent calls. Tests and
    * callers that need the round count use
    * [[connectedComponentsWithRounds]], which returns it per-call.
    */
  @volatile var lastRounds: Int = 0

  /** Reliable-checkpoint file of a checkpointed DataFrame round, for
    * stale-round cleanup (Spark never deletes reliable checkpoint data
    * unless spark.cleaner.referenceTracking.cleanCheckpoints is on, so a
    * long-lived driver would leak one labels snapshot per round). The
    * checkpointed RDD sits inside the analyzed LogicalRDD; reached via
    * reflection because LogicalRDD is private[sql] — any failure degrades
    * to "no cleanup", never to a wrong result.
    */
  private def checkpointFileOf(df: DataFrame): Option[String] =
    scala.util.Try {
      val plan = df.queryExecution.analyzed
      val rdd = plan.getClass.getMethod("rdd").invoke(plan)
        .asInstanceOf[org.apache.spark.rdd.RDD[_]]
      rdd.getCheckpointFile.orNull
    }.toOption.flatMap(Option(_))

  private def deletePath(df: DataFrame, path: String): Unit =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }

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
      maxRounds: Int = 20,
      edgesDistinct: Boolean = false
  ): DataFrame =
    connectedComponentsWithRounds(vertices, edges, maxRounds, edgesDistinct)._1

  /** [[connectedComponents]] plus the number of propagation rounds the
    * fixpoint took — returned per-call (the `lastRounds` var is a shared
    * diagnostic that races under concurrent calls; the convergence-shape
    * assertions in DedupSpec read this instead).
    *
    * @param edgesDistinct caller guarantees `edges` holds DISTINCT
    *                       directed pairs with `src < dst` (the band-join
    *                       producers q18/q51 end in exactly that
    *                       distinct) — the symmetrized set is then
    *                       distinct by construction and the operator
    *                       skips one full edge-set shuffle.
    */
  def connectedComponentsWithRounds(
      vertices: DataFrame,
      edges: DataFrame,
      maxRounds: Int = 20,
      edgesDistinct: Boolean = false
  ): (DataFrame, Int) = {
    // symmetrize ROW-LOCALLY (explode both directions of each edge)
    // rather than union(edges, swapped): the union spelling evaluates
    // the caller's edge-derivation pipeline once per branch — for q51
    // that recomputed the band-join/df-guard chain twice inside the
    // first materializing job (measured ~2x the edge cost at sf0.1, and
    // a full second corpus pass whenever the edge input isn't cached)
    val sym0 = edges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val sym = (if (edgesDistinct) sym0 else sym0.distinct()).persist()
    // NOTE (r6): seeding labels with the closed-neighborhood minimum
    // (groupBy(src).agg(min(least(src, dst)))) saves one full-edge-set
    // round, but ANY non-trivial seed plan here — aggregate, even
    // checkpointed — trips Catalyst's Union constraint rewrite
    // ("key not found: id#…") in downstream consumers that union labels
    // with the isolated-vertex anti-join (labelsFromPairs). Three
    // spellings were tried and reverted on test evidence; the identity
    // init below is the shape the whole r5 test surface validates.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    // the init aggregate doubles as the EAGER materialization of the
    // persisted labels frame: round 1's plan then unions the cached
    // relation instead of a self-referencing lineage (which trips
    // Catalyst's Union constraint rewrite with a missing-attribute
    // error), and the empty-graph case converges without entering the
    // loop
    var prevSum = labels.agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0)
    var round = 0
    var converged = prevSum == null // empty graph: nothing to propagate
    while (!converged && round < maxRounds) {
      // neighborhood minimum: labels flow across every edge, then each
      // endpoint keeps the min of (its label, incoming labels)
      val viaEdges = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("comp"))
      val hopped = labels.select(col("id"), col("comp")).union(viaEdges)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      // pointer jumping: also adopt the label OF the label, so propagation
      // distance doubles per round — O(log diameter) rounds instead of
      // O(diameter), the same shortcutting star-contraction CC uses
      // eager checkpoint materializes the round AND truncates the logical
      // plan — an iterative self-referencing loop otherwise grows the
      // analyzed plan exponentially (each round embeds the previous
      // round's plan 3x), and analysis time dwarfs the actual work. This
      // is the standard lineage-cut every iterative-on-Spark algorithm
      // (GraphFrames CC, ALS) applies. With a cluster checkpoint dir
      // configured the cut is RELIABLE (HDFS/S3 — survives executor
      // loss, which truncated-lineage localCheckpoint does not); local
      // mode falls back to executor-local storage.
      val next0 = hopped.as("h")
        .join(labels.as("l"), col("h.comp") === col("l.id"), "left")
        .select(col("h.id"),
          least(col("h.comp"), coalesce(col("l.comp"), col("h.comp"))).as("comp"))
      val reliable = vertices.sparkSession.sparkContext.getCheckpointDir.isDefined
      if (!reliable && !warnedLocalFallback) {
        warnedLocalFallback = true
        log.warn("connectedComponents: no checkpoint dir configured - " +
          "falling back to localCheckpoint. Executor-local blocks do NOT " +
          "survive executor loss; on a cluster, set " +
          "sparkContext.setCheckpointDir to a reliable (HDFS/S3) path or " +
          "an executor failure mid-iteration kills the job.")
      }
      // reliable path: EAGER checkpoint (a lazy reliable checkpoint would
      // re-run the whole job a second time to write the files). local
      // path: LAZY localCheckpoint — it caches + truncates lineage on
      // first materialization, so the fixpoint agg below doubles as the
      // materializing action and each round costs ONE job instead of two.
      val next = if (reliable) next0.checkpoint(true) else next0.localCheckpoint(false)
      // fixpoint test: per-vertex labels are monotonically non-increasing,
      // so an unchanged sum means no label moved
      val s = next.agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0)
      labels.unpersist()
      // round r materialized from round r-1's checkpoint; r-1's files are
      // now dead (nothing references them) — delete rather than leak one
      // labels snapshot per round (Spark only cleans these itself under
      // cleaner.referenceTracking.cleanCheckpoints)
      if (reliable) {
        checkpointFileOf(labels).foreach(deletePath(next, _))
      }
      labels = next
      converged = (s == null) ||
        (prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      round += 1
    }
    lastRounds = round
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds — " +
        "graph diameter exceeds the bound; raise maxRounds")
    // isolated vertices = singleton components, attached without ever
    // entering the propagation loop. Anti-join against the CHECKPOINTED
    // labels (whose id set == the edge endpoints), not against sym:
    // sym is unpersisted here, and a lazy reference to it would recompute
    // the entire edge-derivation pipeline when the caller finally acts.
    val isolated = vertices.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .withColumn("comp", col("id"))
    sym.unpersist()
    (labels.union(isolated), round)
  }
}

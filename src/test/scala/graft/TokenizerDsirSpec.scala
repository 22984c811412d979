package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Generator-fact pins for the two tokenizer/selection training ops:
  *
  *  - q76_bpe_merges: distributed BPE merge learning must behave like a
  *    merge sequence — per-round best-pair counts are non-increasing
  *    (a post-merge pair can never beat the pair it was built from),
  *    pairs are well-formed two-symbol strings, and each round's winner
  *    differs (a merged pair's residual count collapses).
  *  - q77_dsir_select: the importance-selection must DISCRIMINATE and
  *    GENERALIZE — the target set is a strict subset of the alpha half
  *    (doc_id%8==0 ⊂ grp 0), yet grp 1 (alpha flavor, ZERO overlap with
  *    the target) must be selected at a high rate while both beta groups
  *    are rejected outright. A degenerate scorer (all-selected or
  *    none-selected) fails here before the oracle would even notice.
  */
class TokenizerDsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q76: merge sequence is well-formed with non-increasing counts") {
    val rows = SparkEntry.queries("q76_bpe_merges")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    val pairs = rows.map(_.getString(1))
    val cnts = rows.map(_.getLong(2))
    assert(pairs.distinct.length == 3, s"repeated winner: ${pairs.toSeq}")
    pairs.foreach { p =>
      val syms = p.split(" ")
      assert(syms.length == 2 && syms.forall(_.matches("[a-z]+")),
        s"malformed pair '$p'")
    }
    assert(cnts(0) >= cnts(1) && cnts(1) >= cnts(2) && cnts(2) > 0,
      s"counts not non-increasing: ${cnts.toSeq}")
  }

  test("q76: round-2 winner reflects the applied round-1 merge") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q76_bpe_merges")(spark, sf)
      .collect().sortBy(_.getLong(0))
    val (pair1, cnt2) = (rows(0).getString(1), rows(1).getLong(2))
    // independently re-apply round 1 to the vocabulary and recount the
    // winning pair's RESIDUAL (separator-shared back-to-back runs only):
    // it must fall strictly below the round-2 winner's count, proving
    // the merge was applied to the symbol strings, not just reported
    val merged = SparkEntry.bpeVocab(spark, sf).withColumn("sym",
      expr(s"replace(sym, ' $pair1 ', ' ${pair1.replace(" ", "")} ')"))
    val residual = SparkEntry.bpePairCounts(merged)
      .filter(col("pair") === pair1)
      .collect().headOption.map(_.getLong(1)).getOrElse(0L)
    assert(residual < cnt2,
      s"round-1 merge not applied: residual($pair1)=$residual >= round-2 cnt=$cnt2")
  }

  test("q79: applying the 3 learned merges compresses every language") {
    val rows = SparkEntry.queries("q79_bpe_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, n, before, after) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0, s"$lang: empty token stream")
      assert(after < before, s"$lang: merges did not compress ($after >= $before)")
      assert(after >= n, s"$lang: a word collapsed below one symbol")
    }
  }

  test("q77: selection generalizes to non-target alpha and rejects beta") {
    val rows = SparkEntry.queries("q77_dsir_select")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    val (n0, sel0, sc0) = rows(0L)
    val (n1, sel1, sc1) = rows(1L)
    val (n2, sel2, sc2) = rows(2L)
    val (n3, sel3, sc3) = rows(3L)
    // alpha groups: high selection rate, positive aggregate score;
    // grp 1 has ZERO docs in the target (doc_id%8==0 => grp 0), so its
    // selection is pure generalization of the hashed-feature profile
    assert(sel0 * 10 >= n0 * 9, s"grp0 under-selected: $sel0/$n0")
    assert(sel1 * 10 >= n1 * 9, s"grp1 (non-target alpha) under-selected: $sel1/$n1")
    assert(sc0 > 0 && sc1 > 0)
    // beta groups: rejected outright
    assert(sel2 == 0 && sel3 == 0, s"beta selected: $sel2, $sel3")
    assert(sc2 < 0 && sc3 < 0)
    // non-degenerate: neither all-selected nor none-selected overall
    assert(sel0 + sel1 + sel2 + sel3 > 0)
    assert(sel0 + sel1 + sel2 + sel3 < n0 + n1 + n2 + n3)
  }

  test("q83: every source reports 3 distinctive terms with monotone integer scores") {
    val rows = SparkEntry.queries("q83_tfidf_terms")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // 20 sources x top-3, every score positive (the integer surrogate
    // tf*1e6 div df is >= 1e6/df >= 1e6/nSources for any present token)
    assert(rows.length == 60, s"expected 60 report rows, got ${rows.length}")
    assert(rows.map(_._1).distinct.length == 20)
    assert(rows.forall(_._4 > 0), "non-positive distinctiveness score")
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == Seq(1, 2, 3), s"$src ranks: $byRank")
      // scores non-increasing in rank; ties broken by token ascending
      assert(byRank.sliding(2).forall { case Array(a, b) =>
        a._4 > b._4 || (a._4 == b._4 && a._3 < b._3) }, s"$src order: $byRank")
    }
    // distinctiveness is live, not vacuous: at least one top term is
    // EXCLUSIVE to its source (df = 1 -> score = tf * 1e6)
    assert(rows.exists(_._4 >= 1000000L),
      "no source-exclusive term surfaced — the idf weighting is dead")
  }

  test("q84: sampled decile calibration partitions the corpus into ordered score bands") {
    val rows = SparkEntry.queries("q84_quality_deciles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L), s"deciles: ${rows.map(_._1).toSeq}")
    assert(rows.map(_._2).sum == 500L, "report dropped or duplicated documents")
    // sampled boundaries give NEAR-equal bands, not exact tenths — pin a
    // loose band so a broken bucket expression (everything in decile 1)
    // fails while sampling variance passes
    rows.foreach { case (d, n, lo, hi, toks) =>
      assert(n >= 500 / 20 && n <= 500 / 5, s"decile $d implausible size $n")
      assert(lo <= hi && toks > 0, s"decile $d degenerate: lo=$lo hi=$hi toks=$toks")
    }
    // bands are ordered and DISJOINT: equal scores always land in the
    // same bucket, so each decile's max must sit strictly below the next
    // decile's min
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"deciles ${a._1}/${b._1} overlap: ${a._4} vs ${b._3}")
    }
  }
}

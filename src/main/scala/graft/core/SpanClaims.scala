package graft.core

/** Overlapping-span arbitration — the 1-D web re-binding of the
  * reference's pixel-space clip/resegment processors:
  *
  *  - `clip` ≙ ocropy/clip.py:44-267: segments overlapping a neighbour
  *    lose the contested region to the neighbour with the stronger claim
  *    ("re-assign components which are only contained in the neighbour");
  *    claims are compared by the contested region's share of each
  *    claimant (the majority rule resegment.py states explicitly:
  *    "assign the one with the majority").
  *  - `resegment` ≙ ocropy/resegment.py:57-520: candidate line spans are
  *    assigned to the existing line with the largest overlap ratio
  *    (resegment.py:298-330 fits computation), lines are re-outlined as
  *    the hull of their assigned candidates (join_polygons, :384-388),
  *    and the new outline is subtracted from other overlapping lines
  *    (:397-415 diff_polygons).
  *
  * Both are pure, row-local functions over byte spans — they run inside
  * `Dataset.map` with no shuffle, like every other per-page stage.
  */
object SpanClaims {

  private def interLen(a: Span, b: Span): Long =
    math.max(0L, math.min(a.stop, b.stop) - math.max(a.start, b.start))

  private def len(s: Span): Long = math.max(1L, s.stop - s.start)

  /** Resolve pairwise overlaps among document-ordered blocks: for each
    * overlapping pair, the block for which the contested region is the
    * larger share of itself has the stronger claim (majority rule); the
    * weaker claimant is clipped back to the boundary. Blocks clipped to
    * emptiness are dropped. Output spans are pairwise disjoint and keep
    * document order.
    */
  def clip(blocks: Seq[Block]): Seq[Block] = {
    // sort + resolve adjacent overlaps, to fixpoint. On a start-sorted
    // list, no adjacent overlaps implies global disjointness (stops are
    // bounded by the next start transitively), and every resolution
    // strictly shrinks total covered length, so the loop terminates.
    var cur = blocks.filter(b => b.span.stop > b.span.start)
    var changed = true
    while (changed) {
      changed = false
      val arr = cur.sortBy(b => (b.span.start, b.span.stop, b.id)).toArray
      var i = 0
      while (i < arr.length - 1) {
        val a = arr(i); val b = arr(i + 1)
        val inter = interLen(a.span, b.span)
        if (inter > 0) {
          changed = true
          val fracA = inter.toDouble / len(a.span)
          val fracB = inter.toDouble / len(b.span)
          if (fracA >= fracB) {
            // a's claim wins: clip b's head to a's stop
            arr(i + 1) = b.copy(span =
              Span(math.min(a.span.stop, b.span.stop), b.span.stop))
          } else {
            // b's claim wins: clip a's tail to b's start (a 1-D clip
            // cannot split a span, so a's part beyond b is ceded too)
            arr(i) = a.copy(span =
              Span(a.span.start, math.max(b.span.start, a.span.start)))
          }
        }
        i += 1
      }
      cur = arr.toSeq.filter(b => b.span.stop > b.span.start)
    }
    cur.sortBy(b => (b.span.start, b.span.stop, b.id))
  }

  /** Re-assign candidate spans onto existing lines by majority overlap:
    * candidate c goes to argmax over existing e of |c ∩ e| / |c| when the
    * best fit reaches `minFit` (resegment.py threshold role), else c is
    * dropped. Each existing line is re-outlined as the hull of its
    * assigned candidates (or kept as-is when none), then earlier lines'
    * outlines are subtracted from later overlapping ones. Returns the new
    * span per existing line, index-aligned with `existing`.
    */
  def resegment(existing: Seq[Span], candidates: Seq[Span], minFit: Double = 0.1): Seq[Span] = {
    val assigned = Array.fill(existing.length)(List.empty[Span])
    candidates.foreach { c =>
      var bestI = -1; var bestFit = 0.0
      existing.zipWithIndex.foreach { case (e, i) =>
        val fit = interLen(c, e).toDouble / len(c)
        if (fit > bestFit || (fit == bestFit && fit > 0 && bestI >= 0 &&
          existing(bestI).start > e.start)) {
          bestFit = fit; bestI = i
        }
      }
      if (bestI >= 0 && bestFit >= minFit) assigned(bestI) ::= c
    }
    val hulls = existing.zipWithIndex.map { case (e, i) =>
      val cs = assigned(i)
      if (cs.isEmpty) e
      else Span(cs.map(_.start).min, cs.map(_.stop).max)
    }.toArray
    // subtract earlier outlines from later overlapping ones (1-D diff)
    var j = 1
    while (j < hulls.length) {
      var k = 0
      while (k < j) {
        if (interLen(hulls(j), hulls(k)) > 0) {
          val clippedStart = math.max(hulls(j).start, hulls(k).stop)
          hulls(j) = Span(math.min(clippedStart, hulls(j).stop), hulls(j).stop)
        }
        k += 1
      }
      j += 1
    }
    hulls.toSeq
  }

  /** morph.propagate_labels_majority (ocropy/morph.py role, consumed by
    * resegment.py:418-423): give each unlabeled component the label that
    * claims the majority of its extent; components no label touches stay
    * 0. Ties resolve to the lower label (the reference's argmax over
    * label bincounts picks the first maximum).
    */
  def propagateLabelsMajority(components: Seq[Span], labels: Seq[(Span, Int)]): Seq[Int] =
    components.map { c =>
      var best = 0; var bestLen = 0L
      labels.foreach { case (s, l) =>
        val il = interLen(c, s)
        if (il > bestLen || (il == bestLen && il > 0 && l < best)) {
          bestLen = il; best = l
        }
      }
      best
    }

  /** morph.spread_labels (resegment.py:424-425 role): extend labeled
    * spans into unlabeled space, each position going to the NEAREST
    * labeled span within `maxdist` (ties to the earlier span). Returns
    * the grown span per label, index-aligned with `labels`.
    */
  def spreadLabels(labels: Seq[Span], maxdist: Long): Seq[Span] = {
    val sortedIdx = labels.zipWithIndex.sortBy(_._1.start)
    val grown = labels.toArray
    sortedIdx.sliding(2).foreach {
      case Seq((a, ia), (b, ib)) =>
        val gap = b.start - a.stop
        if (gap > 0) {
          // midpoint split, each side capped at maxdist
          val aGrow = math.min(maxdist, (gap + 1) / 2)
          val bGrow = math.min(maxdist, gap / 2)
          grown(ia) = Span(grown(ia).start, math.min(a.stop + aGrow, b.start))
          grown(ib) = Span(math.max(b.start - bGrow, a.stop + aGrow), grown(ib).stop)
        }
      case _ =>
    }
    grown.toSeq
  }
}

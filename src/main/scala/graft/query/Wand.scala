package graft.query

import graft.index.{Codec, PostingBlock}

/** Document-at-a-time scoring over compressed posting blocks: full DAAT,
  * block-max WAND top-k (disjunctive), and skip-based intersection
  * (conjunctive). This replaces what the reference delegates to Lucene
  * (SURVEY.md §2 F10/F11; public block-max WAND per Ding & Suel 2011 /
  * PAPERS.md).
  *
  * Everything here is single-threaded per salt range; parallelism comes from
  * the engine running one instance per docId-range (salt) partition — the
  * ranges are disjoint sub-indexes, so per-range top-k results merge into a
  * global top-k without re-scoring.
  *
  * Determinism: per-document score = Σ contributions in ascending term
  * order (scorers are sorted by term at construction and contributions are
  * accumulated via `scoreDoc`, which walks terms in that fixed order). The
  * naive oracle sums in the same order → bit-identical doubles.
  */
object Wand {

  /** Streaming cursor over one term's posting blocks (sorted by blockIdx,
    * docIds ascending across blocks). Decodes one block at a time.
    *
    * `boundFactor` compensates for stale stored bounds: blocks persist
    * maxImpact computed with their build-time avgdl; when live-ingested
    * segments shift the corpus avgdl, impact grows by at most
    * liveAvgdl/buildAvgdl (see Handle.liveStats), so scaling every bound by
    * that factor keeps WAND pruning admissible while `avgdl` (the live
    * value) keeps exact scoring correct.
    */
  final class TermScorer(val term: String, blocks: Array[PostingBlock],
                         val idf: Double, avgdl: Double,
                         boundFactor: Double = 1.0) {
    private var bi = 0 // current block
    private var i = 0 // position within decoded block
    private var docs: Array[Long] = _
    private var tfs: Array[Int] = _
    private var dls: Array[Int] = _
    var curDoc: Long = -1L
    val maxScore: Double =
      idf * boundFactor * blocks.iterator.map(_.maxImpact).foldLeft(0.0)(math.max)

    loadBlock()
    advanceInBlock()

    private def loadBlock(): Unit = {
      if (bi < blocks.length) {
        val b = blocks(bi)
        docs = Codec.decodeDeltas(b.docDeltas, b.n, b.firstDocId)
        tfs = Codec.decodeInts(b.tfs, b.n)
        dls = Codec.decodeInts(b.dls, b.n)
        i = -1
      } else { docs = null }
    }

    private def advanceInBlock(): Unit = {
      i += 1
      if (docs != null && i < docs.length) curDoc = docs(i)
      else if (docs != null) { bi += 1; loadBlock(); advanceInBlock() }
      else curDoc = Long.MaxValue
    }

    def exhausted: Boolean = curDoc == Long.MaxValue

    /** Upper bound of this term's contribution for docs in the current
      * block — the block-max refinement.
      */
    def currentBlockMax: Double =
      if (bi < blocks.length) idf * boundFactor * blocks(bi).maxImpact else 0.0

    /** Last docId of the current block (skip boundary). */
    def currentBlockLast: Long =
      if (bi < blocks.length) blocks(bi).lastDocId else Long.MaxValue

    def score: Double = idf * Bm25.impact(tfs(i), dls(i), avgdl)

    def next(): Unit = advanceInBlock()

    /** Advance to the first doc >= target. Skips whole blocks via
      * lastDocId metadata (the skip-pointer path), then scans within.
      */
    def advanceTo(target: Long): Unit = {
      if (curDoc >= target) return
      while (bi < blocks.length && blocks(bi).lastDocId < target) {
        bi += 1; docs = null
      }
      if (bi >= blocks.length) { curDoc = Long.MaxValue; return }
      if (docs == null) loadBlock()
      if (i < 0) i = 0
      // binary search within the decoded block
      var lo = math.max(i, 0)
      var hi = docs.length - 1
      if (docs(lo) >= target) { i = lo; curDoc = docs(i); return }
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (docs(mid) < target) lo = mid else hi = mid - 1
      }
      i = lo
      advanceInBlock()
    }
  }

  /** Fixed-size top-k accumulator with (score desc, docId asc) order. */
  final class TopK(k: Int) {
    // PriorityQueue dequeues the ordering's maximum; we want the root to be
    // the WEAKEST hit (lowest score; among equals, largest docId).
    private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score ⇒ greater
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher docId ⇒ greater
      }
    }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    def threshold: Double = if (heap.size < k) Double.NegativeInfinity else heap.head._1
    def beats(score: Double, docId: Long): Boolean =
      heap.size < k || score > heap.head._1 ||
        (score == heap.head._1 && docId < heap.head._2)
    def insert(score: Double, docId: Long): Unit = {
      if (heap.size < k) heap.enqueue((score, docId))
      else if (beats(score, docId)) { heap.dequeue(); heap.enqueue((score, docId)) }
    }
    def result: Array[(Long, Double)] =
      heap.toArray.sortBy { case (s, d) => (-s, d) }.map { case (s, d) => (d, s) }
  }

  private def sortScorers(s: Array[TermScorer]): Unit =
    java.util.Arrays.sort(s, Ordering.by((x: TermScorer) => x.curDoc))

  /** Score one doc fully: every scorer positioned at `doc` contributes, in
    * ascending-term order. Takes a TERM-SORTED array and scans it — the
    * matching scorers are visited in exactly the ascending-term order the
    * old filter+sortBy produced (identical summation, identical doubles),
    * without allocating and sorting two arrays per scored document (guide
    * §1.2 "per-task work": exhaustive/unranked passes score every matching
    * doc, so the per-doc allocations were the collector's hottest garbage).
    * Exhausted scorers sit at curDoc = Long.MaxValue and never match.
    */
  private def scoreDoc(doc: Long, termSorted: Array[TermScorer]): Double = {
    var s = 0.0
    var i = 0
    while (i < termSorted.length) {
      val sc = termSorted(i)
      if (sc.curDoc == doc) s += sc.score
      i += 1
    }
    s
  }

  /** Disjunctive (OR) top-k via block-max WAND. With k >= candidate count it
    * degrades to exhaustive DAAT (threshold stays -inf) — the mode the
    * verify harness uses so membership is complete.
    *
    * `keep(doc, score)` is the collector admission filter — tombstone
    * liveness (Compactor.tombstone) and/or the search_after cursor's score
    * bound (Searcher.searchAfter): a filtered doc is scored but never
    * inserted, so it cannot occupy a top-k slot — filtering AFTER top-k
    * would under-fill k (a deleted doc's slot must go to the next-best live
    * doc). Skipped inserts only keep the WAND threshold lower than it could
    * be: strictly less pruning, never a wrong result (the Lucene
    * liveDocs-inside-collector semantics; ES applies search_after cursors at
    * the same point).
    */
  def topKOr(scorers0: Array[TermScorer], k: Int,
             keep: (Long, Double) => Boolean = (_, _) => true): Array[(Long, Double)] = {
    val termSorted = scorers0.sortBy(_.term) // scoreDoc's summation order
    var live = scorers0.filter(!_.exhausted)
    val top = new TopK(k)
    while (live.nonEmpty) {
      sortScorers(live)
      val th = top.threshold
      // pivot: first prefix whose summed global UBs can reach the threshold.
      // `>=` not `>`: a doc scoring exactly th can still win on the docId
      // tie-break, so equality must not be pruned (SURVEY.md §7.4 item 2).
      var acc = 0.0
      var p = -1
      var j = 0
      while (j < live.length && p < 0) {
        acc += live(j).maxScore
        if (acc >= th) p = j
        j += 1
      }
      if (p < 0) return top.result // nothing can reach the threshold → done
      val pivotDoc = live(p).curDoc
      if (live(0).curDoc == pivotDoc) {
        // block-max refinement: tighter bound from current blocks, including
        // any scorer beyond p already positioned at the pivot doc.
        var bub = 0.0
        var x = 0
        while (x <= p) { bub += live(x).currentBlockMax; x += 1 }
        while (x < live.length && live(x).curDoc == pivotDoc) {
          bub += live(x).currentBlockMax; x += 1
        }
        if (bub >= th) {
          val s = scoreDoc(pivotDoc, termSorted)
          if (keep(pivotDoc, s)) top.insert(s, pivotDoc)
          var y = 0
          while (y < live.length) {
            if (live(y).curDoc == pivotDoc) live(y).next()
            y += 1
          }
        } else {
          // Skip: no doc in (pivot, min block boundary] can qualify — but
          // cap the jump at the next scorer's cursor (a new term enters
          // there, invalidating the bound) per Ding & Suel's BMW.
          var minBoundary = Long.MaxValue
          var z = 0
          while (z <= p) {
            val lb = live(z).currentBlockLast
            if (lb < minBoundary) minBoundary = lb
            z += 1
          }
          var target = minBoundary + 1
          if (p + 1 < live.length && live(p + 1).curDoc < target)
            target = live(p + 1).curDoc
          if (target <= pivotDoc) target = pivotDoc + 1
          var y = 0
          while (y <= p) {
            if (live(y).curDoc < target) live(y).advanceTo(target)
            y += 1
          }
        }
      } else {
        // advance the laggard (curDoc < pivot) with the largest UB
        var sel = -1
        var y = 0
        while (y <= p) {
          if (live(y).curDoc < pivotDoc &&
              (sel < 0 || live(y).maxScore > live(sel).maxScore)) sel = y
          y += 1
        }
        live(sel).advanceTo(pivotDoc)
      }
      live = live.filter(!_.exhausted)
    }
    top.result
  }

  /** m-of-n scored merge — ES `minimum_should_match`: every doc containing
    * at least `m` of the query terms, scored over the terms it contains.
    * Exhaustive DAAT sorted-merge: the count constraint invalidates
    * topKOr's upper-bound pivoting (eligibility depends on how many
    * scorers align at a doc, not on score mass alone), so like
    * `intersectAnd` this path trades pruning for simplicity and the caller
    * top-ks. Contributions sum in ascending-term order (scorers sorted at
    * entry) — the deterministic-summation convention of `scoreDoc`.
    */
  def mergeAtLeast(scorers0: Array[TermScorer], m: Int): Array[(Long, Double)] = {
    val scorers = scorers0.filter(!_.exhausted).sortBy(_.term)
    if (scorers.length < m) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var done = false
    while (!done) {
      var minDoc = Long.MaxValue
      var i = 0
      while (i < scorers.length) {
        val sc = scorers(i)
        if (!sc.exhausted && sc.curDoc < minDoc) minDoc = sc.curDoc
        i += 1
      }
      if (minDoc == Long.MaxValue) done = true
      else {
        var cnt = 0
        var s = 0.0
        i = 0
        while (i < scorers.length) {
          val sc = scorers(i)
          if (!sc.exhausted && sc.curDoc == minDoc) { cnt += 1; s += sc.score; sc.next() }
          i += 1
        }
        if (cnt >= m) out += ((minDoc, s))
      }
    }
    out.toArray
  }

  /** Conjunctive (AND) scored intersection: sorted-merge with block skips.
    * Returns every doc containing all terms, scored; caller top-ks.
    */
  def intersectAnd(scorers0: Array[TermScorer]): Array[(Long, Double)] = {
    if (scorers0.isEmpty || scorers0.exists(_.exhausted)) return Array.empty
    val scorers = scorers0.sortBy(_.term)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var target = scorers.map(_.curDoc).max
    var done = false
    while (!done) {
      var aligned = true
      var i = 0
      while (i < scorers.length && !done) {
        scorers(i).advanceTo(target)
        if (scorers(i).exhausted) done = true
        else if (scorers(i).curDoc > target) { target = scorers(i).curDoc; aligned = false }
        i += 1
      }
      if (!done && aligned) {
        var s = 0.0
        var j = 0
        while (j < scorers.length) { s += scorers(j).score; j += 1 }
        out += ((target, s))
        target += 1
      }
    }
    out.toArray
  }
}

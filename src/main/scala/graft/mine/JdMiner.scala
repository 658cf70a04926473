package graft.mine

import graft.core.{AttrSet, Jd, Measure}
import graft.entropy.EntropyEngine

import scala.collection.mutable

/** Join-dependency mining: consistent-JD construction for a fixed LHS,
  * DFS enumeration over component merges, LHS minimization, and the
  * minimal-separator fixpoint via minimal transversals
  * (SURVEY.md §2.5 D8-D13; reference `search/MinimalJDGenerator.java`,
  * `search/JDGeneratorGivenLHS.java` in /root/reference).
  *
  * All combinatorics run on the driver; data is touched only through the
  * [[EntropyEngine]] (memoized + shared-scan batched).
  *
  * Cooperative cancellation: pass a `stop` flag checked inside the search
  * loops (the Spark analogue of the reference's volatile STOP +
  * `cancelJobGroup`).
  */
final class JdMiner(eng: EntropyEngine, epsilon: Double,
                    stop: () => Boolean = () => false) {
  private val n = eng.numAttrs
  private val full = eng.fullSet

  /** Pairwise conditional-MI test used by the merge loop, with the
    * threshold slack of the reference (`measure - eps > 1e-5`).
    */
  private def mustMerge(a: AttrSet, b: AttrSet, lhs: AttrSet): Boolean =
    eng.condMutualInfo(a, b, lhs) - epsilon > Measure.ThresholdSlack

  /** Most-specific JD for `lhs`: every non-LHS attribute its own
    * component.
    */
  def mostSpecific(lhs: AttrSet): Jd =
    Jd(lhs, full.minus(lhs).toSeq.map(AttrSet.single).toVector)

  /** Merge-to-consistency (reference D8), graph form — the default.
    * Each round: ONE prefetched entropy batch covers every pairwise
    * conditional-MI test over the current components, every pair
    * exceeding epsilon becomes an undirected must-merge edge, and the
    * edge graph's connected components merge in one shot (the
    * reference's second construction,
    * `search/JDGeneratorGivenLHS.java:337-405` +
    * `common/GraphUtils.java:6-64` in /root/reference). Converges in
    * far fewer rounds — and so far fewer entropy batches — than the
    * pairwise loop, which restarts its O(k^2) sweep after every single
    * merge; consistentJd is the innermost hot loop of min-sep mining.
    * Returns None if attributes `a` and `b` end up in one component or
    * only one component remains (lhs fails to separate a from b), or if
    * the final JD's measure exceeds the (k-1)*epsilon validity bound.
    */
  def consistentJd(lhs: AttrSet, a: Int, b: Int): Option[Jd] = {
    require(!lhs.contains(a) && !lhs.contains(b))
    var jd = mostSpecific(lhs)
    var changed = true
    while (changed && jd.numComponents > 1 && !stop()) {
      changed = false
      val comps = jd.components
      val k = comps.length
      // one shared-scan batch: every entropy the k(k-1)/2 tests may need
      val pairUnions = for (i <- 0 until k - 1; j <- i + 1 until k)
        yield comps(i).union(comps(j)).union(lhs)
      eng.prefetch((comps.map(_.union(lhs)) ++ pairUnions) :+ lhs)
      // must-merge edges -> connected components via union-find
      val parent = Array.tabulate(k)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      for (i <- 0 until k - 1; j <- i + 1 until k
           if mustMerge(comps(i), comps(j), lhs)) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) { parent(rj) = ri; changed = true }
      }
      if (changed) {
        // deterministic component order: groups sorted by smallest member
        val newComps = (0 until k).groupBy(find).toVector.sortBy(_._2.head)
          .map(_._2.map(comps).reduce(_ union _))
        jd = Jd(lhs, newComps)
      }
    }
    validated(jd, a, b)
  }

  /** Merge-to-consistency, pairwise form (reference D8's first
    * construction): repeatedly merge one component pair whose conditional
    * MI given `lhs` exceeds epsilon, rescanning after every merge. Same
    * fixpoint as [[consistentJd]]; kept as its differential oracle (each
    * merge issues fresh entropy queries, so it batches far worse).
    */
  def consistentJdPairwise(lhs: AttrSet, a: Int, b: Int): Option[Jd] = {
    require(!lhs.contains(a) && !lhs.contains(b))
    var jd = mostSpecific(lhs)
    // prefetch the entropies the pairwise tests need for the first sweep
    eng.prefetch(jd.components.map(_.union(lhs)) :+ lhs)
    var stable = false
    while (!stable && jd.numComponents > 1 && !stop()) {
      stable = true
      val k = jd.numComponents
      var i = 0
      while (i < k - 1 && stable) {
        var j = i + 1
        while (j < k && stable) {
          if (mustMerge(jd.components(i), jd.components(j), lhs)) {
            jd = jd.mergeComponents(i, j)
            stable = false
          }
          j += 1
        }
        i += 1
      }
    }
    validated(jd, a, b)
  }

  /** Shared tail of both D8 constructions: reject when lhs fails to
    * separate `a` from `b`, otherwise gate on the JD validity bound.
    */
  private def validated(jd: Jd, a: Int, b: Int): Option[Jd] = {
    val ca = jd.componentOf(a)
    val cb = jd.componentOf(b)
    if (jd.numComponents <= 1 || ca == cb) None
    else {
      val m = eng.jdMeasure(jd)
      val valid = m - (jd.numComponents - 1) * epsilon <= Measure.ThresholdSlack
      if (valid) Some(jd.copy(measure = Measure.exact(m))) else None
    }
  }

  /** DFS over merge sequences from the most-specific JD (reference D9):
    * collect every JD keeping `a` and `b` separated whose measure is
    * within the (k-1)*epsilon bound, up to `limit` results. Merges that
    * push the measure past the bound are pruned (the measure is
    * non-decreasing information loss as components coarsen toward the
    * bound).
    */
  def mineJdsWithLhs(lhs: AttrSet, a: Int, b: Int, limit: Int = 10): Seq[Jd] = {
    val found = mutable.LinkedHashMap.empty[Jd, Jd]
    val visited = mutable.HashSet.empty[Jd]

    def measureOk(jd: Jd): Boolean =
      eng.jdMeasure(jd) - (jd.numComponents - 1) * epsilon <= Measure.ThresholdSlack

    def dfs(jd: Jd): Unit = {
      if (found.size >= limit || stop()) return
      val key = jd.canonical
      if (!visited.add(key)) return
      if (jd.componentOf(a) == jd.componentOf(b)) return
      // merging can only shrink the measure-vs-bound gap further down the
      // merge lattice, so an invalid JD still recurses; validity only
      // gates collection
      if (measureOk(jd)) {
        found.getOrElseUpdate(key, jd.copy(measure = Measure.exact(eng.jdMeasure(jd))))
      }
      val k = jd.numComponents
      for (i <- 0 until k - 1; j <- i + 1 until k if found.size < limit) {
        // never merge a's component with b's
        val mergesAB = (jd.components(i).contains(a) && jd.components(j).contains(b)) ||
          (jd.components(i).contains(b) && jd.components(j).contains(a))
        if (!mergesAB) dfs(jd.mergeComponents(i, j))
      }
    }

    dfs(mostSpecific(lhs))
    found.values.toSeq
  }

  /** LHS minimization (reference D10): greedily drop attributes from the
    * separator while a consistent JD separating (a, b) still exists.
    */
  def minimizeLhs(lhs: AttrSet, a: Int, b: Int): AttrSet = {
    var cur = lhs
    var shrunk = true
    while (shrunk && !stop()) {
      shrunk = false
      val it = cur.toSeq.iterator
      while (it.hasNext && !shrunk) {
        val attr = it.next()
        val cand = cur - attr
        if (consistentJd(cand, a, b).isDefined) {
          cur = cand
          shrunk = true
        }
      }
    }
    cur
  }

  /** Elemental seed (reference D11): for pair (a, b), the most-specific
    * separator R-{a,b}; if it admits a consistent JD, minimize it.
    */
  def elementalSeed(a: Int, b: Int): Option[AttrSet] = {
    val most = full - a - b
    consistentJd(most, a, b).map(_ => minimizeLhs(most, a, b))
  }

  /** Minimal-separator fixpoint for one pair (reference D12): maintain
    * the hypergraph of known minimal (a,b)-separators; every candidate
    * LHS not containing a known separator is the complement of a minimal
    * transversal; each candidate that admits a consistent JD minimizes to
    * a new separator (new hyperedge) until no candidate works.
    */
  def minimalSeparators(a: Int, b: Int): Seq[AttrSet] = {
    val universe = full - a - b
    elementalSeed(a, b) match {
      case None => Nil // a,b inseparable at this threshold
      case Some(seed) =>
        val seps = mutable.LinkedHashSet[AttrSet](seed)
        val tr = new Transversals(universe)
        // an empty seed separator still registers no hyperedge we can
        // transversal-complement below, so handle it as terminal
        if (seed.isEmpty) return seps.toSeq
        tr.addHyperedge(seed)
        var progress = true
        while (progress && !stop()) {
          progress = false
          val candidates = tr.minimalTransversals.iterator
            .map(t => universe.minus(t))
            .filterNot(c => seps.exists(_.subsetOf(c)))
          var it = candidates
          while (it.hasNext && !progress) {
            val cand = it.next()
            consistentJd(cand, a, b) match {
              case Some(_) =>
                val minimized = minimizeLhs(cand, a, b)
                if (!seps.contains(minimized)) {
                  seps += minimized
                  if (minimized.nonEmpty) {
                    tr.addHyperedge(minimized)
                    progress = true
                  }
                }
              case None => ()
            }
          }
        }
        seps.toSeq
    }
  }

  /** All minimal separators over all attribute pairs, with the pairs
    * they separate (the reference's `mineAllMinSeps`).
    */
  def mineAllMinSeps(): Map[AttrSet, Seq[(Int, Int)]] = {
    val out = mutable.HashMap.empty[AttrSet, mutable.ArrayBuffer[(Int, Int)]]
    // the elemental seeds probe every (n-1)/(n-2)-subset entropy — warm
    // them as shared-scan batches before the per-pair loops (C4)
    eng.precomputeMostSpecific()
    for (a <- 0 until n; b <- a + 1 until n if !stop()) {
      for (s <- minimalSeparators(a, b)) {
        out.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += ((a, b))
      }
    }
    out.view.mapValues(_.toSeq).toMap
  }

  /** Full-MVD expansion (reference D13): for each mined minimal
    * separator, enumerate JDs with that LHS (up to `limit` per pair).
    * Pass `seps` when `mineAllMinSeps()` already ran — otherwise the
    * whole fixpoint search would execute a second time.
    */
  def mineAllFullJds(limit: Int = 10,
                     seps: Option[Map[AttrSet, Seq[(Int, Int)]]] = None): Seq[Jd] = {
    val seen = mutable.LinkedHashSet.empty[Jd]
    val sepMap = seps.getOrElse(mineAllMinSeps())
    for ((sep, pairs) <- sepMap.toSeq.sortBy(_._1); (a, b) <- pairs) {
      mineJdsWithLhs(sep, a, b, limit).foreach(jd => seen += jd.canonical)
    }
    seen.toSeq
  }
}

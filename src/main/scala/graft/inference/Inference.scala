package graft.inference

import graft.core.{AttrSet, Mvd}

import scala.collection.mutable

/** Inference modules that upper-bound a candidate dependency's measure
  * from already-discovered dependencies, so the miners can skip Spark
  * entropy jobs (SURVEY.md §2.5 D5/D6; reference
  * `inference/DependencyBasis.java`, `inference/LatticeOrderingInference.java`
  * in /root/reference).
  */

/** Lattice-order inference: a discovered dependency with the same RHS and
  * a smaller-or-equal LHS upper-bounds the candidate's measure
  * (`inference/LatticeOrderingInference.java:10-48`). Sound for FDs
  * (H(Y|X) is monotone non-increasing as X grows); used for MVDs exactly
  * as the reference does — the differential miner-vs-brute-force tests
  * gate its soundness on data.
  */
final class LatticeOrderingInference {
  // rhs -> list of (lhs, measure) of discovered deps
  private val byRhs = mutable.HashMap.empty[AttrSet, mutable.ArrayBuffer[(AttrSet, Double)]]

  def add(lhs: AttrSet, rhs: AttrSet, measure: Double): Unit =
    byRhs.getOrElseUpdate(rhs, mutable.ArrayBuffer.empty) += ((lhs, measure))

  /** Smallest known upper bound for (lhs, rhs), if any. */
  def upperBound(lhs: AttrSet, rhs: AttrSet): Option[Double] =
    byRhs.get(rhs).flatMap { cands =>
      val bounds = cands.collect { case (l, m) if l.subsetOf(lhs) => m }
      if (bounds.isEmpty) None else Some(bounds.min)
    }
}

/** Approximate dependency basis (Beeri fixpoint) with additive measure
  * bounds (`inference/DependencyBasis.java:15-167`,
  * `inference/BeeriAlgorithmInference.java:14-75`).
  *
  * For a determinant X, the basis starts as the single block R-X with
  * bound 0 and is refined by every discovered MVD W ->> Z with W a subset
  * of X: any block S split by Z becomes S&Z and S-Z, each inheriting
  * `bound(S) + measure(W ->> Z)` (subadditivity of the information
  * measure). An MVD X ->> Y whose Y is a union of basis blocks then has
  * measure at most the sum of those blocks' bounds.
  */
final class DependencyBasis(n: Int) {
  private val full = AttrSet.full(n)
  private val discovered = mutable.ArrayBuffer.empty[Mvd]

  def add(m: Mvd): Unit = discovered += m

  /** Basis blocks of R-X with additive upper bounds. */
  def basis(lhs: AttrSet): Seq[(AttrSet, Double)] = {
    var blocks = List((full.minus(lhs), 0.0))
    var changed = true
    while (changed) {
      changed = false
      val applicable = discovered.iterator.filter(_.lhs.subsetOf(lhs))
      for (mvd <- applicable) {
        val z = mvd.rhs.minus(lhs)
        val next = blocks.flatMap { case (s, b) =>
          val in = s.intersect(z)
          if (in.isEmpty || in == s) List((s, b))
          else {
            changed = true
            List((in, b + mvd.measure.value), (s.minus(in), b + mvd.measure.value))
          }
        }
        blocks = next
      }
    }
    blocks
  }

  /** Inferred measure upper bound for lhs ->> rhs, when rhs-lhs is a
    * union of basis blocks.
    */
  def upperBound(lhs: AttrSet, rhs: AttrSet): Option[Double] = {
    val y = rhs.minus(lhs)
    if (y.isEmpty) return Some(0.0)
    val bs = basis(lhs)
    var remaining = y
    var bound = 0.0
    for ((s, b) <- bs if s.subsetOf(remaining)) {
      remaining = remaining.minus(s)
      bound += b
    }
    if (remaining.isEmpty) Some(bound) else None
  }
}

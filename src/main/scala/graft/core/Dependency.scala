package graft.core

/** Interval measure `[lower, upper]` of a dependency's "approximateness".
  *
  * Semantics follow the reference's measure object
  * (`common/Measure.java:4-107`): a dependency is *exact* when its measure
  * is 0; mining keeps dependencies whose measure is below a threshold.
  * Bounds tighten monotonically; a slack of 1e-6 tolerates floating-point
  * noise when a new bound crosses the old one.
  */
final case class Measure(lower: Double, upper: Double) {
  import Measure._
  def isExactlyKnown: Boolean = (upper - lower) <= Slack
  def value: Double = upper
  def withLower(l: Double): Measure =
    if (l > lower) Measure(math.min(l, upper + Slack), upper) else this
  def withUpper(u: Double): Measure =
    if (u < upper) Measure(lower, math.max(u, lower - Slack)) else this
  /** Decided below threshold t (with the reference's 1e-5 slack)? */
  def belowThreshold(t: Double): Boolean = upper - t <= ThresholdSlack
  def aboveThreshold(t: Double): Boolean = lower - t > ThresholdSlack
}

object Measure {
  val Slack = 1e-6          // bound-update slack (common/Measure.java:6)
  val ThresholdSlack = 1e-5 // measure-vs-threshold slack (MinimalJDGenerator.java:213-217)
  val ZeroClamp = 1e-7      // |m| < 1e-7 => 0 (AbstractDataset.java:224-226)
  val unknown: Measure = Measure(0.0, Double.MaxValue)
  def exact(v: Double): Measure = Measure(v, v)
}

/** A functional dependency X -> Y with an entropic measure
  * `H(XY) - H(X)` (0 iff X determines Y exactly).
  */
final case class Fd(lhs: AttrSet, rhs: AttrSet, measure: Measure = Measure.unknown) {
  override def toString: String = s"$lhs -> $rhs : ${measure.value}"
}

/** A multivalued dependency X ->> Y with measure
  * `I(Y; R-X-Y | X) = H(XY) + H(R-Y) - H(R) - H(X)`.
  */
final case class Mvd(lhs: AttrSet, rhs: AttrSet, measure: Measure = Measure.unknown) {
  override def toString: String = s"$lhs ->> $rhs : ${measure.value}"
}

/** A join dependency: separator `lhs` plus pairwise-disjoint components
  * that partition `R - lhs`. Measure is
  * `sum_i H(lhs u C_i) - (k-1) H(lhs) - H(R)` (0 iff the decomposition
  * into clusters `lhs u C_i` is lossless).
  *
  * Reference: `common/dependency/JoinDependency.java:17-106`.
  */
final case class Jd(lhs: AttrSet, components: Vector[AttrSet],
                    measure: Measure = Measure.unknown) {
  require(components.forall(_.disjoint(lhs)), "components must avoid lhs")
  def numComponents: Int = components.length
  def clusters: Vector[AttrSet] = components.map(_.union(lhs))
  def attrs: AttrSet = components.foldLeft(lhs)(_ union _)

  /** Component index containing attribute i, or -1. */
  def componentOf(i: Int): Int = components.indexWhere(_.contains(i))

  /** New JD with components i and j merged (reference D7,
    * `common/dependency/JoinDependency.java:132-171`).
    */
  def mergeComponents(i: Int, j: Int): Jd = {
    val (lo, hi) = if (i < j) (i, j) else (j, i)
    val merged = components(lo).union(components(hi))
    Jd(lhs, components.updated(lo, merged).patch(hi, Nil, 1))
  }

  /** All MVDs implied by binary splits of this JD's components
    * (reference D17, `common/dependency/JoinDependency.java:270-287`).
    */
  def impliedMvds: Seq[Mvd] = {
    val k = components.length
    // each non-trivial binary partition of components -> lhs ->> union(side)
    (1 until (1 << (k - 1))).map { mask =>
      val y = (0 until k).filter(c => (mask & (1 << c)) != 0)
        .map(components).foldLeft(AttrSet.empty)(_ union _)
      Mvd(lhs, y)
    }
  }

  /** Canonical form for set-dedup: components sorted. */
  def canonical: Jd = Jd(lhs, components.sorted, measure)

  /** Reference-parity rendering:
    * `{{lhs}|{c1},{c2},...}` per `JoinDependency.java:252-268`.
    */
  override def toString: String =
    s"{$lhs|${components.mkString(",")}}"
}

/** A two-level index lhs -> rhs -> dependency, with membership tests used
  * by the pruning rules (reference `common/sets/DependencySet.java`).
  */
final class DependencySet[D <: Product](extract: D => (AttrSet, AttrSet)) {
  private val byLhs =
    scala.collection.mutable.HashMap.empty[AttrSet, scala.collection.mutable.HashMap[AttrSet, D]]
  private var count = 0

  def add(d: D): Unit = {
    val (l, r) = extract(d)
    val m = byLhs.getOrElseUpdate(l, scala.collection.mutable.HashMap.empty)
    if (!m.contains(r)) count += 1
    m(r) = d
  }
  def get(lhs: AttrSet, rhs: AttrSet): Option[D] = byLhs.get(lhs).flatMap(_.get(rhs))
  def contains(lhs: AttrSet, rhs: AttrSet): Boolean = get(lhs, rhs).isDefined
  def withLhs(lhs: AttrSet): Iterable[D] = byLhs.get(lhs).map(_.values).getOrElse(Nil)
  def all: Iterable[D] = byLhs.values.flatMap(_.values)
  def size: Int = count
  def lhsSets: Iterable[AttrSet] = byLhs.keys
}

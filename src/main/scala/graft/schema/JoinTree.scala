package graft.schema

import graft.core.{AttrSet, Jd}

import scala.collection.mutable

/** Join-tree construction and JD compatibility
  * (SURVEY.md §2.5 D14/D16; reference
  * `common/dependency/AcyclicSchema.java:23-259` in /root/reference).
  *
  * Applying a JD (X; C1..Ck) to a cluster S containing X splits S into
  * sub-clusters X u (Ci n S). A set of JDs is *compatible* when, applied
  * in ascending separator-size order, every JD finds a single current
  * cluster containing its separator and genuinely splits it — the
  * operational form of conflict-freeness. The final clusters of a
  * compatible set form an acyclic hypergraph; the join tree is their
  * maximum-weight spanning tree under |intersection| edge weights
  * (a classical equivalence), with edge separators = cluster
  * intersections.
  */
object JoinTree {

  final case class Edge(a: Int, b: Int, sep: AttrSet)

  /** A join tree: clusters plus tree edges between cluster indices,
    * each labeled with its separator.
    */
  final case class Tree(clusters: Vector[AttrSet], edges: Vector[Edge]) {
    def separators: Seq[AttrSet] = edges.map(_.sep)
    def adjacency: Map[Int, Seq[Edge]] =
      (edges.flatMap(e => Seq(e.a -> e, e.b -> e)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Split the clusters of `n` attributes by the JDs; None when some JD
    * cannot be applied (the set is incompatible).
    */
  def clustersOf(n: Int, jds: Seq[Jd]): Option[Vector[AttrSet]] = {
    var leaves = Vector(AttrSet.full(n))
    // ascending separator size, as the reference sorts
    for (jd <- jds.sortBy(j => (j.lhs.size, j.lhs))) {
      // several leaves may contain the separator (e.g. every cluster of
      // a prior JD with the same lhs); the JD applies to the one it
      // genuinely splits — taking merely the first match would reject
      // compatible sets
      def splitOf(host: AttrSet): Option[Vector[AttrSet]] = {
        val pieces = jd.components.map(_.intersect(host)).filter(_.nonEmpty)
        // every attr of host-lhs must be covered by the pieces (the JD's
        // components partition R-lhs, so this holds whenever host wholly
        // sits inside the JD's attribute universe)
        if (pieces.length >= 2 &&
          host.subsetOf(pieces.foldLeft(jd.lhs)(_ union _)))
          Some(pieces.map(_.union(jd.lhs)))
        else None
      }
      val applied = leaves.zipWithIndex.collectFirst {
        case (l, i) if jd.lhs.subsetOf(l) && splitOf(l).isDefined =>
          (i, splitOf(l).get)
      }
      applied match {
        case Some((idx, split)) => leaves = leaves.patch(idx, split, 1)
        case None => return None
      }
    }
    Some(leaves)
  }

  /** Pairwise compatibility (conflict-freeness) test. */
  def compatible(n: Int, j1: Jd, j2: Jd): Boolean =
    clustersOf(n, Seq(j1, j2)).isDefined &&
      clustersOf(n, Seq(j2, j1)).isDefined

  /** Maximum-weight spanning tree over clusters with |intersection|
    * weights (Kruskal). For clusters from a compatible JD set this is a
    * valid join tree (running-intersection property).
    */
  def build(clusters: Vector[AttrSet]): Tree = {
    val k = clusters.length
    val parent = Array.tabulate(k)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    val candidates = (for {
      i <- 0 until k; j <- i + 1 until k
    } yield Edge(i, j, clusters(i).intersect(clusters(j))))
      .sortBy(e => (-e.sep.size, e.a, e.b))
    val edges = mutable.ArrayBuffer.empty[Edge]
    for (e <- candidates if edges.size < k - 1) {
      val (ra, rb) = (find(e.a), find(e.b))
      if (ra != rb) { parent(ra) = rb; edges += e }
    }
    Tree(clusters, edges.toVector)
  }

  def fromJds(n: Int, jds: Seq[Jd]): Option[Tree] =
    clustersOf(n, jds).map(build)
}

package graft.schema

import graft.core.{AttrSet, Jd}

import scala.collection.mutable

/** An acyclic schema: a set of pairwise-compatible JDs plus the derived
  * clusters and join tree (reference `common/dependency/AcyclicSchema.java`).
  */
final case class AcyclicSchema(n: Int, jds: Vector[Jd]) {
  lazy val tree: JoinTree.Tree = JoinTree.fromJds(n, jds)
    .getOrElse(throw new IllegalArgumentException(s"incompatible JD set: $jds"))
  def clusters: Vector[AttrSet] = tree.clusters
  def separators: Seq[AttrSet] = tree.separators
}

/** Enumerate acyclic schemas = maximal independent sets of the JD
  * incompatibility graph, BFS extend-from-excluded-node
  * (SURVEY.md §2.5 D15; reference `search/AcyclicSchemaEnumerator.java:37-133`,
  * `common/BitSetMatrixGraph.java` in /root/reference).
  */
final class SchemaEnumerator(n: Int, jds: Vector[Jd]) {
  private val k = jds.length
  // incompatibility adjacency over JD indices
  private val incompat: Vector[AttrSet] = {
    val adj = Array.fill(k)(mutable.Set.empty[Int])
    for (i <- 0 until k; j <- i + 1 until k
         if !JoinTree.compatible(n, jds(i), jds(j))) {
      adj(i) += j; adj(j) += i
    }
    adj.toVector.map(s => AttrSet.of(s))
  }

  private def maximalize(seed: AttrSet): AttrSet = {
    var s = seed
    for (v <- 0 until k) {
      if (!s.contains(v) && incompat(v).disjoint(s)) s = s + v
    }
    s
  }

  /** Lazily enumerate maximal independent sets: start from the greedy
    * maximal set; each emitted set S expands by every excluded node v —
    * drop v's neighbors from S, add v, re-maximalize. Pairwise
    * compatibility is the reference's filter, but the operational
    * join-tree build is the ground truth — sets whose tree fails to
    * assemble are expanded from but not emitted (`skippedUnrealizable`
    * counts them).
    */
  var skippedUnrealizable: Int = 0

  def schemas(limit: Int = Int.MaxValue): Iterator[AcyclicSchema] = {
    if (k == 0) return Iterator.empty
    val seen = mutable.HashSet.empty[AttrSet]
    val queue = mutable.Queue[AttrSet](maximalize(AttrSet.empty))
    seen += queue.head
    val raw = new Iterator[AttrSet] {
      override def hasNext: Boolean = queue.nonEmpty
      override def next(): AttrSet = {
        val s = queue.dequeue()
        for (v <- 0 until k if !s.contains(v)) {
          val nxt = maximalize(s.minus(incompat(v)) + v)
          if (seen.add(nxt)) queue.enqueue(nxt)
        }
        s
      }
    }
    raw.flatMap { s =>
      val schema = AcyclicSchema(n, s.toSeq.map(jds).toVector)
      if (JoinTree.fromJds(n, schema.jds).isDefined) Some(schema)
      else { skippedUnrealizable += 1; None }
    }.take(limit)
  }
}

package graft.decompose

import graft.core.AttrSet
import graft.schema.JoinTree
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-driven decomposition evaluation: project the (deduplicated)
  * relation onto a schema's clusters, compute the acyclic-join
  * cardinality by count-folding along the join tree *without
  * materializing the join*, and count spurious tuples
  * (SURVEY.md §2.3 A7-A9; reference
  * `entropy/NewSmallDBInMemory.java:354-452` in /root/reference).
  *
  * The fold is message passing on the join tree: each leaf sends its
  * parent the per-separator-value count of its cluster projection; a
  * parent multiplies its own unit counts by each child message (inner
  * join on the separator columns — an empty separator degenerates to a
  * cross join with a one-row total, reference J4); the root's count sum
  * is the join size. Each step is a DataFrame equijoin + groupBy-sum:
  * Catalyst broadcasts the (small, aggregated) message side and the whole
  * fold runs without ever building the exponential join result.
  *
  * Counts are `DECIMAL(38,0)`: spurious-tuple products overflow Long at
  * 100 TB-scale cross joins (the reference's `long` can overflow —
  * SURVEY §7 risk 5); an overflow surfaces as null and throws here
  * rather than wrapping silently.
  */
final class Decomposer(relation: DataFrame) {

  private val attrNames = relation.columns

  /** Decomposition-path semantics: duplicates dropped first
    * (`entropy/NewSmallDBInMemory.java:271-281`).
    */
  val distinctRelation: DataFrame = relation.distinct().cache()
  lazy val numTuples: Long = distinctRelation.count()

  private def cols(x: AttrSet): Seq[Column] = x.toSeq.map(i => col(attrNames(i)))
  private def colNames(x: AttrSet): Seq[String] = x.toSeq.map(attrNames)

  /** P3: distinct cluster projection with a unit count column. */
  def clusterTable(c: AttrSet): DataFrame =
    distinctRelation.select(cols(c): _*).distinct()
      .withColumn("cnt", lit(1L).cast(DecimalType(38, 0)))

  /** P5: cluster projection row count. */
  def clusterSize(c: AttrSet): Long = clusterTable(c).count()

  /** A7/A8: acyclic-join cardinality via the join-tree count fold.
    * `tableFor` lets callers supply pre-cached cluster tables.
    */
  def joinSize(tree: JoinTree.Tree,
               tableFor: AttrSet => DataFrame = clusterTable): BigInt = {
    val adj = tree.adjacency
    def fold(node: Int, parent: Int): DataFrame = {
      var t = tableFor(tree.clusters(node))
      for (e <- adj.getOrElse(node, Nil)) {
        val child = if (e.a == node) e.b else e.a
        if (child != parent) {
          val childDf = fold(child, node)
          if (e.sep.isEmpty) {
            val msg = childDf.agg(sum(col("cnt")).as("cnt_c"))
            t = t.crossJoin(msg)
          } else {
            val msg = childDf.groupBy(cols(e.sep): _*)
              .agg(sum(col("cnt")).as("cnt_c"))
            t = t.join(msg, colNames(e.sep), "inner")
          }
          t = t.withColumn("cnt", col("cnt") * col("cnt_c")).drop("cnt_c")
        }
      }
      t
    }
    val row = fold(0, -1).agg(sum(col("cnt"))).head()
    if (row.isNullAt(0)) {
      if (numTuples == 0) BigInt(0)
      else throw new ArithmeticException("join-size overflow beyond DECIMAL(38,0)")
    } else BigInt(row.getDecimal(0).toBigInteger)
  }

  /** J5 slow-path oracle: materialize the n-way distinct join and count
    * (`entropy/SmallDBInMemory.java:207-301`). Exponential — tests and
    * cross-checks only.
    */
  def distinctJoinCount(clusters: Seq[AttrSet]): Long = {
    val joined = clusters.map(clusterTable(_).drop("cnt")).reduce { (a, b) =>
      val common = a.columns.toSet.intersect(b.columns.toSet).toSeq
      if (common.isEmpty) a.crossJoin(b) else a.join(b, common, "inner")
    }
    joined.distinct().count()
  }

  /** A9: full evaluation of one schema against the data. Each cluster
    * projection is computed once, cached for both the size counts and
    * the fold, and released afterwards.
    */
  def evaluate(tree: JoinTree.Tree): DecompositionInfo = {
    val cached = tree.clusters.distinct.map(c => c -> clusterTable(c).cache()).toMap
    try {
      val sizes = tree.clusters.map(c => cached(c).count())
      val js = joinSize(tree, cached)
      DecompositionInfo(
        clusters = tree.clusters,
        clusterSizes = sizes,
        joinSize = js,
        spurious = js - numTuples,
        numTuples = numTuples)
    } finally cached.values.foreach(_.unpersist())
  }
}

/** Evaluation result (reference `DecompositionInfo`):
  * spurious = joinSize - |distinct relation|; totalCells weights each
  * cluster's tuples by its width.
  */
final case class DecompositionInfo(
    clusters: Vector[AttrSet],
    clusterSizes: Vector[Long],
    joinSize: BigInt,
    spurious: BigInt,
    numTuples: Long) {
  def largestRelation: Long = if (clusterSizes.isEmpty) 0 else clusterSizes.max
  def smallestRelation: Long = if (clusterSizes.isEmpty) 0 else clusterSizes.min
  def totalTuples: Long = clusterSizes.sum
  def totalCells: Long =
    clusters.zip(clusterSizes).map { case (c, s) => c.size * s }.sum
  def isLossless: Boolean = spurious == 0
}

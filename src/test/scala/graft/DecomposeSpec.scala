package graft

import graft.core.{AttrSet, Jd}
import graft.decompose.{Decomposer, DecompositionService}
import graft.entropy.EntropyEngine
import graft.mine.JdMiner
import graft.schema.{AcyclicSchema, JoinTree, SchemaEnumerator}
import org.scalatest.funsuite.AnyFunSuite

class DecomposeSpec extends AnyFunSuite {
  import SparkSuite._

  private val j1 = Jd(AttrSet(1), Vector(AttrSet(0), AttrSet(2, 3)))
  private val j2 = Jd(AttrSet(2), Vector(AttrSet(0, 1), AttrSet(3)))
  private val jCross = Jd(AttrSet(0, 2), Vector(AttrSet(1), AttrSet(3)))

  test("clustersOf applies JDs to a path decomposition") {
    val cl = JoinTree.clustersOf(4, Seq(j1, j2))
    assert(cl.contains(Vector(AttrSet(0, 1), AttrSet(1, 2), AttrSet(2, 3))))
  }

  test("compatibility: path JDs compatible, crossing JDs not") {
    assert(JoinTree.compatible(4, j1, j2))
    assert(!JoinTree.compatible(4, j1, jCross))
  }

  test("join tree has running-intersection separators") {
    val tree = JoinTree.fromJds(4, Seq(j1, j2)).get
    assert(tree.edges.length == 2)
    assert(tree.separators.toSet == Set(AttrSet(1), AttrSet(2)))
  }

  test("schema enumerator emits maximal compatible sets") {
    val jds = Vector(j1, j2, jCross)
    val schemas = new SchemaEnumerator(4, jds).schemas().toSeq
    val sets = schemas.map(_.jds.toSet).toSet
    assert(sets == Set(Set(j1, j2), Set(jCross)))
  }

  test("fold join size equals distinct-join count (lossless and lossy)") {
    for (noise <- Seq(0, 10)) {
      val dec = new Decomposer(relation(chainFixture(noise)))
      val clusters = Vector(AttrSet(0, 1), AttrSet(1, 2), AttrSet(2, 3))
      val tree = JoinTree.build(clusters)
      val fold = dec.joinSize(tree)
      val slow = dec.distinctJoinCount(clusters)
      assert(fold == BigInt(slow), s"noise=$noise")
      if (noise == 0) assert(fold == BigInt(dec.numTuples)) // lossless
      else assert(fold > BigInt(dec.numTuples)) // spurious tuples appear
    }
  }

  test("empty separator degenerates to a cross join") {
    val dec = new Decomposer(relation(chainFixture(0)))
    val tree = JoinTree.build(Vector(AttrSet(0), AttrSet(3)))
    assert(tree.edges.head.sep.isEmpty)
    val expected = dec.clusterSize(AttrSet(0)) * dec.clusterSize(AttrSet(3))
    assert(dec.joinSize(tree) == BigInt(expected))
  }

  test("evaluate reports sizes and spuriousness") {
    val dec = new Decomposer(relation(chainFixture(0)))
    val info = dec.evaluate(JoinTree.build(Vector(AttrSet(0, 1), AttrSet(1, 2, 3))))
    assert(info.isLossless)
    assert(info.clusterSizes.length == 2)
    assert(info.totalTuples == info.clusterSizes.sum)
    assert(info.totalCells ==
      2 * info.clusterSizes(0) + 3 * info.clusterSizes(1))
  }

  test("decomposition service memoizes and returns the evaluation") {
    val dec = new Decomposer(relation(chainFixture(0)))
    val svc = new DecompositionService(spark, dec, workers = 2, cacheMax = 10)
    val tree = JoinTree.build(Vector(AttrSet(0, 1), AttrSet(1, 2, 3)))
    val a = svc.submitJobSynchronous(tree)
    val b = svc.submitJobSynchronous(tree)
    assert(a == b)
    svc.shutdown()
  }

  test("end to end: mine separators, enumerate schemas, evaluate losslessly") {
    val rows = chainFixture(0)
    val eng = new EntropyEngine(relation(rows).cache())
    val miner = new JdMiner(eng, 0.0)
    val jds = miner.mineAllFullJds(limit = 5).toVector
    assert(jds.nonEmpty)
    val schemas = new SchemaEnumerator(4, jds).schemas(limit = 5).toSeq
    assert(schemas.nonEmpty)
    val dec = new Decomposer(relation(rows))
    for (schema <- schemas.take(2)) {
      val info = dec.evaluate(schema.tree)
      // JDs mined at threshold 0 on exact data must reassemble losslessly
      assert(info.isLossless, s"schema ${schema.clusters} spurious=${info.spurious}")
    }
  }
}

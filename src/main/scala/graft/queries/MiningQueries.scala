package graft.queries

import graft.Tables
import graft.core.AttrSet
import graft.entropy.EntropyEngine
import graft.mine.{FdMiner, JdMiner, MvdMiner}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-contract exposure of the mining stack (SURVEY.md §2.5): each
  * query mines dependencies of a small lineitem projection and emits the
  * results as rows. Not SQL-expressible (lattice/transversal search), so
  * these register rows-only; their correctness gate is the ScalaTest
  * differential oracles (miner == brute force, min-seps == MVD-derived
  * ground truth).
  */
object MiningQueries {

  private val cols3 = Seq("l_returnflag", "l_linestatus", "l_quantity")

  private def engine(s: SparkSession, dir: String): EntropyEngine =
    new EntropyEngine(Tables.lineitem(s, dir)
      .select(cols3.map(org.apache.spark.sql.functions.col): _*).cache())

  private def strDf(s: SparkSession, names: Seq[String],
                    rows: Seq[Seq[String]]): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*),
      StructType(names.map(StructField(_, StringType, nullable = false))))

  /** D2/D1: minimal approximate FDs. The synthetic columns are near-
    * independent (no exact FDs), so mine at a 2-bit threshold where the
    * low-entropy flag/status columns are determined approximately.
    */
  private def mineFds(s: SparkSession, dir: String): DataFrame = {
    val fds = new FdMiner(engine(s, dir), 2.0).mineMinimal()
    strDf(s, Seq("lhs", "rhs", "measure"),
      fds.sortBy(f => (f.lhs, f.rhs)).map(f =>
        Seq(f.lhs.toString, f.rhs.toString,
          (math.rint(f.measure.value * 1e6) / 1e6).toString)))
  }

  /** D3/D4: approximate MVDs (inference-accelerated miner). */
  private def mineMvds(s: SparkSession, dir: String): DataFrame = {
    val mvds = new MvdMiner(engine(s, dir), 1.0).mine()
    strDf(s, Seq("lhs", "rhs"),
      mvds.sortBy(m => (m.lhs, m.rhs)).map(m =>
        Seq(m.lhs.toString, m.rhs.toString)))
  }

  /** D11/D12: minimal separators for every attribute pair. */
  private def mineSeps(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    val miner = new JdMiner(eng, 1.0)
    val rows = for {
      a <- 0 until eng.numAttrs
      b <- a + 1 until eng.numAttrs
      sep <- miner.minimalSeparators(a, b).sorted
    } yield Seq(a.toString, b.toString, sep.toString)
    strDf(s, Seq("a", "b", "separator"), rows)
  }

  /** D8/D9/D13: JDs mined for each minimal separator. */
  private def mineJds(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    val miner = new JdMiner(eng, 1.0)
    val rows = miner.mineAllFullJds(limit = 5).sortBy(_.toString).map(jd =>
      Seq(jd.lhs.toString, jd.components.mkString(","),
        (math.rint(jd.measure.value * 1e6) / 1e6).toString))
    strDf(s, Seq("separator", "components", "measure"), rows)
  }

  def qs: Seq[QueryDef] = Seq(
    QueryDef("d_mine_fds", mineFds, None),
    QueryDef("d_mine_mvds", mineMvds, None),
    QueryDef("d_mine_minseps", mineSeps, None),
    QueryDef("d_mine_jds", mineJds, None),
  )
}

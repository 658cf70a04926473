package graft.queries

import graft.Tables
import graft.core.AttrSet
import graft.entropy.EntropyEngine
import graft.mine.{FdMiner, JdMiner, MvdMiner}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-contract exposure of the mining stack (SURVEY.md §2.5): each
  * query mines dependencies of a small lineitem projection and emits the
  * results as rows.
  *
  * On a fixed 3-attribute universe the mined sets are deterministic
  * functions of the 8-subset entropy lattice, so every query here carries
  * a full DuckDB oracle ([[MiningOracles]]) that independently re-derives
  * the result in SQL — measure formulas, clamps, and threshold slacks
  * included. The ScalaTest differential oracles (miner == brute force,
  * min-seps == MVD-derived ground truth) remain the algorithmic gate.
  */
object MiningQueries {

  private def engine(s: SparkSession, dir: String): EntropyEngine =
    new EntropyEngine(Tables.lineitem(s, dir)
      .select(MiningOracles.cols.map(org.apache.spark.sql.functions.col): _*).cache())

  /** Per-query entropy-engine telemetry — (Spark jobs issued, memo hits)
    * of the most recent run. The reference reports exactly these counters
    * per mining run (`search/MinimalJDGenerator.java:970-979` in
    * /root/reference); [[graft.Bench]] folds them into its JSON line so
    * a batching regression (the real 100x-scale risk: many small entropy
    * jobs instead of few shared-scan batches) is visible per round.
    */
  val telemetry = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]

  private def recorded(name: String, eng: EntropyEngine)
                      (body: => DataFrame): DataFrame = {
    val out = body
    telemetry(name) = (eng.numQueriesIssued, eng.numCacheHits)
    out
  }

  /** Round to 6 decimals, half away from zero — DuckDB `round` parity. */
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mkDf(s: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val depSchema = StructType(Seq(
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("measure", DoubleType, nullable = false)))

  /** D2/D1: minimal approximate FDs. The synthetic columns are near-
    * independent (no exact FDs), so mine at a 2-bit threshold where the
    * low-entropy flag/status columns are determined approximately.
    */
  private def mineFds(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    recorded("d_mine_fds", eng) {
      val fds = new FdMiner(eng, 2.0).mineMinimal()
      mkDf(s, depSchema, fds.sortBy(f => (f.lhs, f.rhs)).map(f =>
        Row(f.lhs.toString, f.rhs.toString, r6(f.measure.value))))
    }
  }

  /** D3/D4: approximate MVDs (inference-accelerated miner). */
  private def mineMvds(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    recorded("d_mine_mvds", eng) {
      val mvds = new MvdMiner(eng, 1.0).mine()
      val schema = StructType(Seq(
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false)))
      mkDf(s, schema, mvds.sortBy(m => (m.lhs, m.rhs)).map(m =>
        Row(m.lhs.toString, m.rhs.toString)))
    }
  }

  /** D11/D12: minimal separators for every attribute pair. */
  private def mineSeps(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    recorded("d_mine_minseps", eng) {
      val miner = new JdMiner(eng, 1.0)
      val schema = StructType(Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("separator", StringType, nullable = false)))
      val rows = for {
        a <- 0 until eng.numAttrs
        b <- a + 1 until eng.numAttrs
        sep <- miner.minimalSeparators(a, b).sorted
      } yield Row(a.toString, b.toString, sep.toString)
      mkDf(s, schema, rows)
    }
  }

  /** D8/D9/D13: JDs mined for each minimal separator. */
  private def mineJds(s: SparkSession, dir: String): DataFrame = {
    val eng = engine(s, dir)
    recorded("d_mine_jds", eng) {
      val miner = new JdMiner(eng, 1.0)
      val schema = StructType(Seq(
        StructField("separator", StringType, nullable = false),
        StructField("components", StringType, nullable = false),
        StructField("measure", DoubleType, nullable = false)))
      val rows = miner.mineAllFullJds(limit = 5).sortBy(_.toString).map(jd =>
        Row(jd.lhs.toString, jd.components.mkString(","), r6(jd.measure.value)))
      mkDf(s, schema, rows)
    }
  }

  def qs: Seq[QueryDef] = Seq(
    QueryDef("d_mine_fds", mineFds, Some(MiningOracles.fdSql(2.0))),
    QueryDef("d_mine_mvds", mineMvds, Some(MiningOracles.mvdSql(1.0))),
    QueryDef("d_mine_minseps", mineSeps, Some(MiningOracles.minsepsSql)),
    QueryDef("d_mine_jds", mineJds, Some(MiningOracles.jdsSql)),
  )
}

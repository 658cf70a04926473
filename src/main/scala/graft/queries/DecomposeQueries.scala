package graft.queries

import graft.Tables
import graft.core.AttrSet
import graft.decompose.Decomposer
import graft.schema.JoinTree
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Decomposition-evaluation operator queries (SURVEY.md §2.3 A7-A9,
  * §2.4 J3-J5) against the lineitem projections, each cross-checked by a
  * DuckDB oracle that materializes the join the fold avoids.
  */
object DecomposeQueries {

  private val cols3 = Seq("l_returnflag", "l_linestatus", "l_quantity")
  private val cols4 = cols3 :+ "l_discount"

  // The 5 decomposition queries share the two deduped cached relations
  // per (session, dir) — the cached distinct() is the analogue of the
  // reference's per-worker encoded-table copy, built once.
  private val decomposers =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), Decomposer]

  private def decomposerFor(s: SparkSession, dir: String, cols: Seq[String]) =
    decomposers.getOrElseUpdate((s, dir, cols.length),
      new Decomposer(Tables.lineitem(s, dir)
        .select(cols.map(org.apache.spark.sql.functions.col): _*)))

  private def decomposer3(s: SparkSession, dir: String) = decomposerFor(s, dir, cols3)

  private def decomposer4(s: SparkSession, dir: String) = decomposerFor(s, dir, cols4)

  private def infoDf(s: SparkSession, names: Seq[String], vals: Seq[Long]): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(Row(vals: _*)),
      StructType(names.map(StructField(_, LongType, nullable = false))))

  /** A7: two-cluster join-tree count fold (join size + spurious). */
  private def a7Fold(s: SparkSession, dir: String): DataFrame = {
    val dec = decomposer3(s, dir)
    val tree = JoinTree.build(Vector(AttrSet(0, 1), AttrSet(1, 2)))
    val js = dec.joinSize(tree)
    infoDf(s, Seq("join_size", "spurious"),
      Seq(js.toLong, (js - dec.numTuples).toLong))
  }

  private val a7Sql =
    """SELECT CAST(js.c AS BIGINT) AS join_size, CAST(js.c - dc.c AS BIGINT) AS spurious
      |FROM (SELECT count(*) AS c
      |      FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) a
      |      JOIN (SELECT DISTINCT l_linestatus, l_quantity FROM lineitem) b
      |      USING (l_linestatus)) js,
      |     (SELECT count(*) AS c
      |      FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
      |            FROM lineitem) t) dc""".stripMargin

  /** A8: three-cluster path-tree fold on the 4-column projection. */
  private def a8Fold(s: SparkSession, dir: String): DataFrame = {
    val dec = decomposer4(s, dir)
    val tree = JoinTree.build(Vector(AttrSet(0, 1), AttrSet(1, 2), AttrSet(2, 3)))
    val js = dec.joinSize(tree)
    infoDf(s, Seq("join_size", "spurious"),
      Seq(js.toLong, (js - dec.numTuples).toLong))
  }

  private val a8Sql =
    """SELECT CAST(js.c AS BIGINT) AS join_size, CAST(js.c - dc.c AS BIGINT) AS spurious
      |FROM (SELECT count(*) AS c
      |      FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) a
      |      JOIN (SELECT DISTINCT l_linestatus, l_quantity FROM lineitem) b
      |      USING (l_linestatus)
      |      JOIN (SELECT DISTINCT l_quantity, l_discount FROM lineitem) c
      |      USING (l_quantity)) js,
      |     (SELECT count(*) AS c
      |      FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_quantity,
      |            l_discount FROM lineitem) t) dc""".stripMargin

  /** J4: empty-separator (cross join) degenerate fold. */
  private def j4Cross(s: SparkSession, dir: String): DataFrame = {
    val dec = decomposer3(s, dir)
    val tree = JoinTree.build(Vector(AttrSet(0), AttrSet(2)))
    infoDf(s, Seq("join_size"), Seq(dec.joinSize(tree).toLong))
  }

  private val j4Sql =
    """SELECT CAST((SELECT count(DISTINCT l_returnflag) FROM lineitem) *
      |            (SELECT count(DISTINCT l_quantity) FROM lineitem) AS BIGINT)
      |       AS join_size""".stripMargin

  /** J5: slow-path DISTINCT n-way join count (the oracle the fold is
    * checked against in the reference's own self-test).
    */
  private def j5Distinct(s: SparkSession, dir: String): DataFrame = {
    val dec = decomposer3(s, dir)
    infoDf(s, Seq("cnt"),
      Seq(dec.distinctJoinCount(Seq(AttrSet(0, 1), AttrSet(1, 2)))))
  }

  private val j5Sql =
    """SELECT CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) a
      |JOIN (SELECT DISTINCT l_linestatus, l_quantity FROM lineitem) b
      |USING (l_linestatus)""".stripMargin

  /** A9: full decomposition statistics. */
  private def a9Stats(s: SparkSession, dir: String): DataFrame = {
    val dec = decomposer3(s, dir)
    val tree = JoinTree.build(Vector(AttrSet(0, 1), AttrSet(1, 2)))
    val info = dec.evaluate(tree)
    infoDf(s,
      Seq("num_tuples", "join_size", "spurious", "largest_relation",
        "smallest_relation", "total_tuples", "total_cells"),
      Seq(info.numTuples, info.joinSize.toLong, info.spurious.toLong,
        info.largestRelation, info.smallestRelation, info.totalTuples,
        info.totalCells))
  }

  private val a9Sql =
    """WITH s1 AS (SELECT count(*) AS c
      |            FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) t),
      |     s2 AS (SELECT count(*) AS c
      |            FROM (SELECT DISTINCT l_linestatus, l_quantity FROM lineitem) t),
      |     dc AS (SELECT count(*) AS c
      |            FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
      |                  FROM lineitem) t),
      |     js AS (SELECT count(*) AS c
      |            FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) a
      |            JOIN (SELECT DISTINCT l_linestatus, l_quantity FROM lineitem) b
      |            USING (l_linestatus))
      |SELECT CAST(dc.c AS BIGINT) AS num_tuples,
      |       CAST(js.c AS BIGINT) AS join_size,
      |       CAST(js.c - dc.c AS BIGINT) AS spurious,
      |       CAST(greatest(s1.c, s2.c) AS BIGINT) AS largest_relation,
      |       CAST(least(s1.c, s2.c) AS BIGINT) AS smallest_relation,
      |       CAST(s1.c + s2.c AS BIGINT) AS total_tuples,
      |       CAST(2 * s1.c + 2 * s2.c AS BIGINT) AS total_cells
      |FROM s1, s2, dc, js""".stripMargin

  def qs: Seq[QueryDef] = Seq(
    QueryDef("a7_join_fold", a7Fold, Some(a7Sql)),
    QueryDef("a8_tree_fold_3way", a8Fold, Some(a8Sql)),
    QueryDef("j4_cross_join", j4Cross, Some(j4Sql)),
    QueryDef("j5_distinct_join", j5Distinct, Some(j5Sql)),
    QueryDef("a9_decomp_stats", a9Stats, Some(a9Sql)),
  )
}

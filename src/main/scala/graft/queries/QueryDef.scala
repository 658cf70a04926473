package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle SQL over the
  * same parquet tables. The driver's correctness gate hash-compares the
  * two at sf0.01 with columns sorted by name — so every computed column is
  * aliased identically on both sides, and floating-point outputs are
  * rounded to a fixed number of decimals on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Sql {
  /** DuckDB SQL expression for the Shannon entropy H(cols) of `table`,
    * with N = raw row count — mirrors EntropyEngine's
    * `log2(N) - sum(c*log2(c))/N`.
    */
  def entropyExpr(table: String, cols: Seq[String]): String = {
    val n = s"(SELECT CAST(count(*) AS DOUBLE) FROM $table)"
    s"(log2($n) - (SELECT sum(cnt*log2(cnt)) FROM (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM $table GROUP BY ${cols.mkString(", ")}) g_) / $n)"
  }
}

package graft

import graft.functions.{CosineSimilarity, DamerauLevenshtein, DotProduct, JaroWinkler, L2Squared, LshBuckets, PqAdc, PqCodeDist, PqEncode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native Catalyst
  * expressions, so SQL and `call_function` can reach them. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done by
  * [[graft.Sessions.builder]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "vec_l2sq"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Squared(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DamerauLevenshtein(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        (exprs(1), exprs(2)) match {
          case (Literal(t: Int, _), Literal(p: Int, _)) =>
            LshBuckets(exprs(0), t, p)
          case other => throw new IllegalArgumentException(
            s"lsh_buckets(vec, tables, planes) needs integer literals, got $other")
        }
      }))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        (exprs(2), exprs(3)) match {
          case (Literal(m: Int, _), Literal(k: Int, _)) =>
            PqEncode(exprs(0), exprs(1), m, k)
          case other => throw new IllegalArgumentException(
            s"pq_encode(vec, codebook, m, ksub) needs integer m/ksub literals, got $other")
        }
      }))
    e.injectFunction((
      FunctionIdentifier("pq_code_dist"),
      new ExpressionInfo(classOf[PqCodeDist].getName, "pq_code_dist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        exprs(3) match {
          case Literal(k: Int, _) =>
            PqCodeDist(exprs(0), exprs(1), exprs(2), k)
          case other => throw new IllegalArgumentException(
            s"pq_code_dist(vec, codebook, codes, ksub) needs an integer " +
              s"ksub literal, got $other")
        }
      }))
    e.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        exprs(2) match {
          case Literal(k: Int, _) => PqAdc(exprs(0), exprs(1), k)
          case other => throw new IllegalArgumentException(
            s"pq_adc(table, codes, ksub) needs an integer ksub literal, got $other")
        }
      }))
  }
}

/** Canonical SparkSession builder settings for the engine: shuffle
  * parallelism sized to local cores (not the 200 default), AQE on, UTC,
  * and the graft extensions.
  *
  * `SPARK_GRAFT_CONF` (semicolon-separated `key=value` pairs) lays
  * extra configuration on top — the measurement hook used by the
  * optimization rounds' config A/Bs (e.g.
  * `spark.sql.join.preferSortMergeJoin=false`). Values here never
  * change what a query computes, only how its plan executes; the
  * driver does not set it, so the benched defaults are exactly the
  * explicit `.config(...)` calls below.
  */
object Sessions {
  def builder(cpus: Int): org.apache.spark.sql.SparkSession.Builder = {
    val b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foldLeft(b) { (acc, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => acc.config(k.trim, v.trim)
          case _ =>
            System.err.println(s"[graft] ignoring malformed SPARK_GRAFT_CONF entry '$kv'")
            acc
        }
      }
  }
}

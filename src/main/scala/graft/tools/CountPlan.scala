package graft.tools

import graft.{Sessions, SparkEntry}

/** Diagnostic: print the optimized plan Catalyst produces for
  * `query.count()` — i.e. what [[graft.Bench]] WOULD have measured under
  * a count-based harness. If this prints an empty `Project` over the
  * relation (scan-side projection queries) or drops a join-back stage,
  * a count() timing of that query measures a bare row-count scan, not
  * the operator; [[graft.Materialize]] exists because of exactly this.
  *
  * Usage: runMain graft.tools.CountPlan <queryName> <sfDir>
  */
object CountPlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(
      graft.Env.cpus(default = 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    println("=== count() optimized plan ===")
    println(df.groupBy().count().queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}

package graft.tools

/** Prints one registered query's oracle SQL to stdout (debugging the
  * DuckDB replay without a full Verify run).
  * Usage: runMain graft.tools.PrintOracle <queryName>
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql.getOrElse(args(0),
      sys.error(s"no oracle for '${args(0)}'")))
}

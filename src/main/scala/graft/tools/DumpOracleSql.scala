package graft.tools

/** Dev utility: dump every registered oracle SQL to /tmp for direct
  * DuckDB iteration without a full Verify run.
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.oracleSql.foreach { case (k, v) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/oracle_$k.sql"), v)
    }
    println("dumped " + graft.SparkEntry.oracleSql.size + " oracles to /tmp")
  }
}

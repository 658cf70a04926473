package graft.cli

import java.io.{File, FileWriter, PrintWriter}

/** Telemetry CSV report sinks with the reference's exact column sets
  * (SURVEY.md §2.1 S8 / BASELINE.md; `Main.java:82-145`,
  * `search/MinimalJDGenerator.java:944-1085`,
  * `search/AcyclicSchemaEnumerator.java:243-301` in /root/reference).
  * Append mode with a flush per record, as the reference writes.
  */
final class CsvReport(path: String, header: Seq[String]) {
  private val file = new File(path)
  if (file.getParentFile != null) file.getParentFile.mkdirs()
  private val fresh = !file.exists() || file.length() == 0
  private val out = new PrintWriter(new FileWriter(file, true))
  if (fresh) { out.println(header.mkString(",")); out.flush() }

  def record(values: Seq[Any]): Unit = {
    out.println(values.map(v => escape(v.toString)).mkString(","))
    out.flush()
  }

  private def escape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def close(): Unit = out.close()
}

object Reports {
  /** `Main.java:86-89` mining telemetry columns. */
  val MiningHeader = Seq("#Attributes", "#Rows", "Threshold", "#MVDs",
    "#File Scans", "Scan Time", "Total Time", "%Scanning")

  /** `search/MinimalJDGenerator.java:970-979` JD-mining telemetry. */
  val JdMiningHeader = Seq("#Attributes", "#Rows", "Threshold", "Range Size",
    "Timeout", "Completed", "#Minimal Separators", "#Full MVDs",
    "Table Build Time", "#Queries", "Query Time", "%Querying",
    "#Cached Entropies", "Total Time")

  /** `search/AcyclicSchemaEnumerator.java:261-265` enumeration telemetry. */
  val EnumHeader = Seq("JDMeasure", "Separator Size", "Elapsed", "#Schemas",
    "Largest Relation", "#Relations", "#Spurious Tuples",
    "DecompositionSize Tuples", "DecompositionSize Cells")
}

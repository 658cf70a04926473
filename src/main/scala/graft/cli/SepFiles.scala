package graft.cli

import graft.core.{AttrSet, Jd, Measure}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's `.sep` JD interchange format, kept verbatim for
  * cross-tool fixture parity (SURVEY.md §2.1 S7/S9; sink
  * `search/MinimalJDGenerator.java:877-901`, source
  * `search/AcyclicSchemaEnumerator.java:136-218` in /root/reference):
  *
  *   numAtts,{{lhsAtts}|{comp1},{comp2},...},measure
  *   e.g. `13,{{4, 9}|{1},{6, 11},{2, 5},{3}},8.881784197001252E-16`
  *
  * The mining threshold rides in the filename as `...THRESH.<t>.sep`.
  */
object SepFiles {

  private val setRe = "\\{([^{}]*)\\}".r

  private def parseSet(body: String): AttrSet =
    if (body.trim.isEmpty) AttrSet.empty
    else AttrSet.of(body.split(",").map(_.trim.toInt))

  /** Parse one `.sep` line into (numAtts, Jd). */
  def parseLine(line: String): (Int, Jd) = {
    val firstComma = line.indexOf(',')
    val lastComma = line.lastIndexOf(',')
    require(firstComma > 0 && lastComma > firstComma, s"bad .sep line: $line")
    val numAtts = line.substring(0, firstComma).trim.toInt
    val measure = line.substring(lastComma + 1).trim.toDouble
    val mid = line.substring(firstComma + 1, lastComma).trim
    val bar = mid.indexOf('|')
    require(bar > 0, s"bad .sep JD body: $mid")
    val lhs = parseSet(setRe.findFirstMatchIn(mid.substring(0, bar))
      .map(_.group(1)).getOrElse(""))
    val comps = setRe.findAllMatchIn(mid.substring(bar + 1))
      .map(m => parseSet(m.group(1))).toVector
    (numAtts, Jd(lhs, comps, Measure.exact(measure)))
  }

  def formatLine(numAtts: Int, jd: Jd): String = {
    def fmt(s: AttrSet): String = s.bits.mkString("{", ", ", "}")
    s"$numAtts,{${fmt(jd.lhs)}|${jd.components.map(fmt).mkString(",")}},${jd.measure.value}"
  }

  def read(path: String): Seq[(Int, Jd)] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq
      .map(_.trim).filter(_.nonEmpty).map(parseLine)

  def write(path: String, numAtts: Int, jds: Seq[Jd]): Unit = {
    val parent = Paths.get(path).getParent
    if (parent != null) Files.createDirectories(parent)
    Files.write(Paths.get(path),
      jds.map(formatLine(numAtts, _)).mkString("", "\n", "\n")
        .getBytes("UTF-8"))
  }

  /** Threshold parsed from a `...THRESH.<t>.sep` filename. */
  def thresholdOf(fileName: String): Option[Double] = {
    val re = ".*THRESH\\.([0-9.Ee+-]+)\\.sep$".r
    fileName match {
      case re(t) => t.toDoubleOption
      case _ => None
    }
  }
}

package graft.tools

import graft.Sessions
import graft.Tables

/** Regenerates the pinned BPE vocabulary in
  * [[graft.ops.BpeVocab]]: trains [[graft.ops.Bpe.train]] on the
  * deterministic low-id sample of a documents table and prints the
  * merge list as Scala source. Usage:
  *
  * {{{ runMain graft.tools.DumpBpe /root/testdata/sf0.001 256 40 }}}
  */
object DumpBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sampleDocs = args.lift(1).map(_.toInt).getOrElse(256)
    val numMerges = args.lift(2).map(_.toInt).getOrElse(40)
    val spark = Sessions.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = graft.ops.Bpe.trainOnTable(spark,
      Tables.documents(spark, dir), "doc_id", "text", sampleDocs, numMerges)
    println(s"// trained from $dir sample=$sampleDocs merges=${merges.size}")
    merges.grouped(4).foreach { g =>
      println(g.map { case (a, b) => s"""("$a", "$b")""" }.mkString("    ", ", ", ","))
    }
    spark.stop()
  }
}

package graft.tools

import graft.Sessions
import graft.Tables

/** Regenerates the pinned BPE vocabulary artifact
  * ([[graft.ops.BpeVocab]], `src/main/resources/graft/bpe_merges.tsv`).
  *
  * Two modes:
  *
  *  - `--files <out.tsv> <numMerges> <file>...` — train on local public
  *    text files (no Spark) and write the merge table as rank-ordered
  *    `A\tB` lines. This is how the shipped artifact was produced, from
  *    the Apache-licensed text bundled with the Spark distribution
  *    (LICENSE, NOTICE, README.md, the licenses dir) — a deterministic stand-in
  *    for a published `vocab.bpe`: real pipelines tokenize with a fixed
  *    foreign-trained vocabulary, not one refit per corpus snapshot.
  *    Symbols never contain whitespace (the pre-token pattern excludes
  *    it), so TSV is delimiter-safe.
  *
  *  - `<sfDir> <sampleDocs> <numMerges>` — train on a documents table
  *    sample and print the merges as Scala source (diagnostics; the
  *    synthetic corpus has ~31 distinct words and saturates below 100
  *    merges, which is why the shipped artifact trains on files).
  */
object DumpBpe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--files")) {
      val out = args(1)
      val numMerges = args(2).toInt
      val files = args.drop(3)
      val corpus = files.iterator.flatMap { f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines()
      }.toVector
      val merges = graft.ops.Bpe.train(corpus, numMerges)
      val body = merges.map { case (a, b) => s"$a\t$b" }.mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), body)
      println(s"// trained ${merges.size} merges from ${files.length} files -> $out")
      return
    }
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

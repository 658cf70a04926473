package graft.ops

/** Pinned BPE merge table — the production tokenizer shape: a FIXED
  * vocabulary artifact shipped with the pipeline (like a published
  * `vocab.bpe`), not a per-run training product, so token counts are
  * stable across corpus snapshots.
  *
  * The artifact (`graft/bpe_merges.tsv` on the classpath, 2500 merges)
  * was trained with [[graft.tools.DumpBpe]] `--files` on the
  * Apache-licensed text bundled with the Spark distribution (LICENSE,
  * NOTICE, README.md and the licenses dir) — public English/legal prose
  * with a real vocabulary. The synthetic documents corpus itself has
  * only ~31 distinct words and saturates BPE below 100 merges, so a
  * corpus-trained table cannot reach realistic size; using a
  * foreign-trained public vocabulary is exactly how production
  * pipelines tokenize (GPT-2's vocab.bpe is trained once on public
  * text, then applied to every corpus). Corpus words mostly do NOT
  * appear verbatim in the training text, so encoding genuinely
  * exercises the multi-symbol merge loop, not just pre-tokenization.
  */
object BpeVocab {
  val merges: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "graft/bpe_merges.tsv missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { l =>
      val t = l.indexOf('\t')
      (l.substring(0, t), l.substring(t + 1))
    }.toVector
    finally in.close()
  }
}

package graft.ops

/** Pinned BPE merge table — the production tokenizer shape: a FIXED
  * vocabulary artifact shipped with the pipeline (like a published
  * `vocab.bpe`), not a per-run training product, so token counts are
  * stable across corpus snapshots. Regenerate with
  * `runMain graft.tools.DumpBpe <sfDir> <sampleDocs> <numMerges>`.
  *
  * Deliberately TRUNCATED (40 merges, trained on the sf0.001 low-id
  * sample): corpus words encode to genuine multi-symbol subword
  * sequences, so the encode merge loop — not just pre-tokenization —
  * is what any gate over these counts exercises. The per-corpus
  * exhaustively-trained variant lives in `text_token_count_bpe_real`.
  */
object BpeVocab {
  val merges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "r"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("m", "er"), ("t", "a"), ("or", "t"), ("s", "ort"),
    ("par", "t"), ("d", "ow"), ("in", "dow"), ("w", "indow"),
    ("u", "p"), ("c", "o"), ("co", "lu"), ("colu", "m"),
    ("colum", "n"), ("j", "o"), ("jo", "in"), ("d", "er"),
    ("or", "der"), ("a", "g"), ("ag", "g"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("l", "ow"), ("s", "low"), ("a", "lu"),
    ("alu", "e"), ("in", "e"), ("l", "ine"), ("v", "alue"),
  )
}

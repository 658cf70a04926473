package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Real byte-pair-encoding token counting: a driver-side BPE trainer
  * (learn a merge table from a bounded text sample) plus a distributed
  * merge-loop encoder. This is the actual BPE algorithm — iterative
  * highest-frequency pair merging at train time, lowest-rank pair
  * merging at encode time — over character-level symbols within the
  * regex pre-tokens of [[TextAnalysis.BpeishPattern]] (the same
  * pre-tokenization split published BPE vocabularies use). The cheap
  * regex count ([[TextAnalysis.tokenCountBpeish]]) stays as the
  * scan-speed filter; this path is for when real merge-aware counts
  * matter (context-length budgeting, dedup by token overlap).
  *
  * 100 TB shape: training reads a BOUNDED sample (like a coarse
  * quantizer, a merge table only needs corpus-typical frequencies, not
  * the corpus); encoding is one `mapPartitions` pass with a broadcast
  * rank table and a per-partition word -> count memo, so each distinct
  * pre-token pays the merge loop once per partition, not once per
  * occurrence. No shuffle is introduced at all.
  */
object Bpe {

  private val preTok = TextAnalysis.BpeishPattern.r

  /** Lowercased regex pre-tokens of one text. */
  private[ops] def preTokens(text: String): Iterator[String] =
    if (text == null) Iterator.empty
    else preTok.findAllIn(text.toLowerCase)

  /** Learn `numMerges` merges from a corpus sample (driver-side).
    * Deterministic: ties on pair frequency break toward the
    * lexicographically smallest pair, and the word table is processed
    * in sorted order. Stops early when no adjacent pair repeats.
    *
    * Incremental: pair counts live in a hash map with an inverted
    * pair -> word-ids index and an ordered candidate set, so each merge
    * touches only the words that contain the merged pair — O(occurrences
    * + log P) per merge instead of a full vocabulary rescan, which is
    * what makes thousands of merges (a realistic vocabulary) train in
    * seconds. Output is bit-identical to the naive rescanning trainer
    * (BpeSpec pins hand-computed sequences).
    */
  def train(corpus: Iterable[String], numMerges: Int): Vector[(String, String)] = {
    val wordFreq = mutable.HashMap.empty[String, Long]
    for (text <- corpus; w <- preTokens(text))
      wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    val entries = wordFreq.toVector.sortBy(_._1)
    val words: Array[Vector[String]] =
      entries.map(_._1.map(_.toString).toVector).toArray
    val freqs: Array[Long] = entries.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // candidates ordered best-first: highest count, then smallest pair
    implicit val ord: Ordering[(Long, (String, String))] =
      new Ordering[(Long, (String, String))] {
        private val pairOrd = Ordering.Tuple2[String, String]
        def compare(a: (Long, (String, String)),
                    b: (Long, (String, String))): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // count descending
          if (c != 0) c else pairOrd.compare(a._2, b._2)
        }
      }
    val queue = mutable.TreeSet.empty[(Long, (String, String))]

    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val before = pairCount.getOrElse(p, 0L)
      if (before > 0) queue.remove((before, p))
      val after = before + delta
      if (after > 0) {
        pairCount(p) = after
        queue.add((after, p))
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
      } else {
        pairCount.remove(p)
        pairWords.remove(p)
      }
      // on subtraction the word may still be listed for p via another
      // occurrence — harmless: stale word ids re-check membership below
    }

    for (wi <- words.indices; i <- 0 until words(wi).length - 1)
      bump((words(wi)(i), words(wi)(i + 1)), freqs(wi), wi)

    val out = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      queue.headOption.filter(_._1 > 1) match {
        case None => done = true
        case Some((_, best)) =>
          out += best
          // rewrite only the words that contain the merged pair
          for (wi <- pairWords.getOrElse(best, mutable.Set.empty).toArray.sorted) {
            val old = words(wi)
            val merged = mergeAll(old, best)
            // stale index entries (the word lost its occurrence through
            // an earlier rewrite) merge to an identical vector -> skip
            if (merged != old) {
              for (i <- 0 until old.length - 1)
                bump((old(i), old(i + 1)), -freqs(wi), wi)
              for (i <- 0 until merged.length - 1)
                bump((merged(i), merged(i + 1)), freqs(wi), wi)
              words(wi) = merged
            }
          }
          // the merged pair itself must be gone after the rewrites
          assert(!pairCount.contains(best), s"merge $best left a residue")
          step += 1
      }
    }
    out.result()
  }

  /** Merge every occurrence of `pair` in one left-to-right pass. */
  private def mergeAll(syms: Vector[String],
                       pair: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        b += syms(i) + syms(i + 1)
        i += 2
      } else {
        b += syms(i)
        i += 1
      }
    }
    b.result()
  }

  /** Encode one pre-token with the trained ranks: repeatedly merge the
    * lowest-rank adjacent pair present, exactly the published BPE
    * inference loop.
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else {
        syms = mergeAll(syms, bestPair)
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Token count of one full text under the trained merges, with a
    * caller-supplied word memo (hot words pay the merge loop once).
    */
  private def countText(text: String, ranks: Map[(String, String), Int],
                        memo: mutable.HashMap[String, Int]): Int = {
    var n = 0
    for (w <- preTokens(text))
      n += memo.getOrElseUpdate(w, encode(w, ranks).length)
    n
  }

  /** Distributed token counts: `(idCol, n_tokens)` for every row. One
    * narrow `mapPartitions` pass — broadcast ranks, per-partition memo,
    * no shuffle. (`mapPartitions` is justified here: the merge loop is
    * inherently iterative per word and benefits from cross-row
    * memoization no `Expression` could carry.)
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Int]
        it.map { case (id, text) => (id, countText(text, ranks, memo)) }
      }
      .toDF(idCol, "n_tokens")
  }

  /** Train on a bounded, deterministic sample of a document table (the
    * lowest `sampleDocs` ids) — the scale-correct way to fit the merge
    * table before a full-corpus encode.
    */
  def trainOnTable(spark: SparkSession, docs: DataFrame, idCol: String,
                   textCol: String, sampleDocs: Int,
                   numMerges: Int): Vector[(String, String)] = {
    val sample = docs.orderBy(col(idCol)).limit(sampleDocs)
      .select(col(textCol).cast("string")).collect().map(_.getString(0))
    train(sample.toSeq, numMerges)
  }
}

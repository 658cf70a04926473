package graft

import graft.ops.{Bpe, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import SparkSuite._

  test("trainer reproduces the hand-computed merge sequence") {
    // word freqs: low x3, lower x2, newest x1
    val corpus = Seq("low low low", "lower lower", "newest")
    // round 1: (l,o)=5 ties (o,w)=5 -> lexicographic tie-break picks (l,o)
    // round 2: (lo,w)=5 dominates -> (lo,w)
    // round 3: (e,r)=2 ties (low,e)=2 -> ("e","r") < ("low","e")
    val merges = Bpe.train(corpus, numMerges = 3)
    assert(merges == Vector(("l", "o"), ("lo", "w"), ("e", "r")))
  }

  test("incremental trainer matches a naive full-rescan reference") {
    // naive reference: recount every pair from scratch each round
    def naiveTrain(corpus: Seq[String], numMerges: Int): Vector[(String, String)] = {
      def mergeAll(syms: Vector[String], p: (String, String)): Vector[String] = {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
            b += syms(i) + syms(i + 1); i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }
      val wf = scala.collection.mutable.HashMap.empty[String, Long]
      for (t <- corpus; w <- TextAnalysis.BpeishPattern.r.findAllIn(t.toLowerCase))
        wf(w) = wf.getOrElse(w, 0L) + 1L
      var words = wf.toVector.sortBy(_._1)
        .map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = Vector.newBuilder[(String, String)]
      var step = 0
      var done = false
      while (step < numMerges && !done) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((syms, f) <- words; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + f
        val rep = pc.filter(_._2 > 1)
        if (rep.isEmpty) done = true
        else {
          val best = rep.toVector.minBy { case (p, c) => (-c, p) }._1
          out += best
          words = words.map { case (s, f) => (mergeAll(s, best), f) }
          step += 1
        }
      }
      out.result()
    }
    // pseudo-random corpus rich enough to exercise deep merge chains,
    // repeated-symbol runs, and frequency ties
    val rng = new Lcg(99)
    val syll = Vector("ab", "ba", "ca", "aa", "bb", "xyz", "qu", "tt")
    val corpus = (0 until 120).map { _ =>
      (0 until 12).map(_ =>
        (0 until 1 + rng.nextInt(3)).map(_ => syll(rng.nextInt(syll.size)))
          .mkString).mkString(" ")
    }
    val fast = Bpe.train(corpus, numMerges = 200)
    val naive = naiveTrain(corpus, numMerges = 200)
    assert(fast == naive)
  }

  test("trainer stops when no pair repeats") {
    val merges = Bpe.train(Seq("abc"), numMerges = 100)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("trainer sustains a 2000+ merge vocabulary on a rich corpus") {
    // generated vocabulary: 3000 distinct 6-12 char words, each frequent
    // enough to merge fully -> tens of thousands of learnable pairs.
    // (The registry corpus tops out at 89 merges — 31 distinct words —
    // so vocabulary scale is exercised here, where the data allows it.)
    val rng = new Lcg(7)
    val vocab = (0 until 3000).map { _ =>
      (0 until 6 + rng.nextInt(7)).map(_ => ('a' + rng.nextInt(26)).toChar)
        .mkString
    }.distinct
    val corpus = vocab.grouped(50)
      .map(ws => (ws ++ ws.take(25)).mkString(" ")).toSeq // skewed freqs
    val t0 = System.nanoTime()
    val merges = Bpe.train(corpus, numMerges = 2500)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.size >= 2000, s"only ${merges.size} merges")
    assert(merges.distinct.size == merges.size) // no pair learned twice
    assert(sec < 60.0, f"training took $sec%.1f s") // incremental, not O(V) rescans
    // the trained table drives the real encoder end to end
    val ranks = merges.zipWithIndex.toMap
    val enc = Bpe.encode(vocab.head, ranks)
    assert(enc.mkString == vocab.head)
  }

  test("encoder applies merges lowest-rank first") {
    val ranks = Vector(("l", "o"), ("lo", "w"), ("e", "r")).zipWithIndex.toMap
    // unseen word built from trained subwords
    assert(Bpe.encode("lowest", ranks) == Vector("low", "e", "s", "t"))
    assert(Bpe.encode("lower", ranks) == Vector("low", "er"))
    assert(Bpe.encode("x", ranks) == Vector("x"))
  }

  test("distributed token counts equal the driver-side encoder") {
    val texts = Seq(
      0L -> "the lower tower flows lower and lower",
      1L -> "Newest newest NEWEST lowest",
      2L -> "mixed 123 punct!! lower-case",
      3L -> "")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(texts.map(t => Row(t._1, t._2)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))
    val merges = Bpe.train(texts.map(_._2), numMerges = 50)
    val got = Bpe.tokenCounts(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ranks = merges.zipWithIndex.toMap
    for ((id, text) <- texts) {
      val exp = TextAnalysis.BpeishPattern.r
        .findAllIn(text.toLowerCase)
        .map(w => Bpe.encode(w, ranks).length).sum
      assert(got(id) == exp, s"doc $id")
    }
    // merge-aware counts never exceed character counts and never fall
    // below the regex pre-token count
    val pre = df.select(col("doc_id"),
        TextAnalysis.tokenCountBpeish(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, _) <- texts) assert(got(id) >= pre(id))
  }

  test("rank-order greedy-replace fold equals the merge-loop encoder") {
    // the equivalence the SQL oracle of text_token_count_bpe_pinned
    // rests on: folding merges in rank order with greedy left-to-right
    // literal replacement over a delimited symbol string gives exactly
    // the lowest-rank-first merge loop (a merge only creates
    // pairs containing its new symbol, so no lower-rank pair can appear
    // after its turn). String.replace and DuckDB replace() share the
    // greedy non-overlapping left-to-right semantics.
    // each symbol rides between DISTINCT left/right delimiters: a
    // space-separated form shares the boundary space between adjacent
    // pattern occurrences, so one greedy pass merges only the FIRST
    // pair of an `aaaa` run — bracketed tokens are disjoint and one
    // pass IS mergeAll
    val L = "\u0001"; val R = "\u0002"
    def tok(s: String) = L + s + R
    def foldEncode(w: String, merges: Seq[(String, String)]): Vector[String] = {
      var state = w.map(c => tok(c.toString)).mkString
      for ((a, b) <- merges) state = state.replace(tok(a) + tok(b), tok(a + b))
      state.split(L).toVector.filter(_.nonEmpty).map(_.stripSuffix(R))
    }
    val rng = new Lcg(21)
    // small alphabet -> dense repeats, including aa/aaa runs that
    // stress the greedy-overlap corner of mergeAll
    val words = (0 until 200).map(_ =>
      (0 until 3 + rng.nextInt(10)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
    val merges = Bpe.train(words, numMerges = 60)
    val ranks = merges.zipWithIndex.toMap
    for (w <- words ++ Seq("aaa", "aaaa", "aaaaa", "abab", "aabb")) {
      assert(foldEncode(w, merges) == Bpe.encode(w, ranks), s"word $w")
    }
    // and for the pinned production vocabulary itself
    val pinnedRanks = graft.ops.BpeVocab.merges.zipWithIndex.toMap
    for (w <- Seq("customer", "window", "sort", "value", "partition", "lineitem"))
      assert(foldEncode(w, graft.ops.BpeVocab.merges) ==
        Bpe.encode(w, pinnedRanks), s"word $w")
  }
}

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

  test("trainer stops when no pair repeats") {
    val merges = Bpe.train(Seq("abc"), numMerges = 100)
    assert(merges.isEmpty) // every pair occurs once
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
}

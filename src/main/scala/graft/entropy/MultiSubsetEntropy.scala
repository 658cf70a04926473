package graft.entropy

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Single-pass multi-subset entropy: ONE scan, no Expand, k group-count
  * maps — the direct Spark analogue of the reference's shared file scan
  * feeding many subsets at once (`entropy/ExternalFileDataSet.java:91-166`
  * in /root/reference; SURVEY §7's optional custom aggregate).
  *
  * Each row contributes one 64-bit hash per subset (`xxhash64` of the
  * subset's columns); the aggregator keeps a count map per subset and
  * finishes to `sum c*log2 c` per subset, from which the engine derives
  * `H = log2 N - sum/N`.
  *
  * Trade-offs vs the GROUPING SETS batch (the engine's default):
  *   - no k-fold row expansion before the shuffle: the scan emits one
  *     k-long array per row and partial maps merge on combine;
  *   - executor memory is O(sum of per-subset distinct counts) per
  *     partition — the reference's own profile. Use for many LOW-
  *     cardinality subsets; prefer GROUPING SETS when a subset is nearly
  *     key-like;
  *   - group identity is the 64-bit hash: two groups colliding would
  *     merge (the reference's in-memory path has the same property at 32
  *     bits; at 64 bits the bias is negligible for any feasible group
  *     count).
  */
object MultiSubsetEntropy {

  /** Aggregator over the per-row array of k subset hashes. */
  final class Agg(k: Int)
      extends Aggregator[Seq[Long], Array[mutable.HashMap[Long, Long]], Seq[Double]] {

    override def zero: Array[mutable.HashMap[Long, Long]] =
      Array.fill(k)(mutable.HashMap.empty[Long, Long])

    override def reduce(buf: Array[mutable.HashMap[Long, Long]],
                        hashes: Seq[Long]): Array[mutable.HashMap[Long, Long]] = {
      var i = 0
      while (i < k) {
        val m = buf(i)
        m.update(hashes(i), m.getOrElse(hashes(i), 0L) + 1L)
        i += 1
      }
      buf
    }

    override def merge(a: Array[mutable.HashMap[Long, Long]],
                       b: Array[mutable.HashMap[Long, Long]]): Array[mutable.HashMap[Long, Long]] = {
      var i = 0
      while (i < k) {
        val (big, small) = if (a(i).size >= b(i).size) (a(i), b(i)) else (b(i), a(i))
        small.foreach { case (h, c) => big.update(h, big.getOrElse(h, 0L) + c) }
        a(i) = big
        i += 1
      }
      a
    }

    /** Per subset: `sum over groups of c * log2(c)`. */
    override def finish(buf: Array[mutable.HashMap[Long, Long]]): Seq[Double] = {
      val log2 = math.log(2.0)
      buf.toSeq.map { m =>
        var s = 0.0
        m.foreach { case (_, c) => if (c > 1) s += c * (math.log(c.toDouble) / log2) }
        s
      }
    }

    override def bufferEncoder: Encoder[Array[mutable.HashMap[Long, Long]]] =
      Encoders.javaSerialization[Array[mutable.HashMap[Long, Long]]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `sum c*log2 c` for each column subset, in one scan of `df`.
    *
    * Group identity hashes interleave a null-indicator with every column:
    * Spark's `xxhash64` skips NULL inputs entirely, so without the
    * indicators the groups (NULL, v) and (v, NULL) of a 2-column subset
    * would hash identically and merge.
    */
  def sumClogC(df: DataFrame, subsets: Seq[Seq[Column]]): Seq[Double] = {
    require(subsets.nonEmpty)
    val hashes = array(subsets.map(cols =>
      xxhash64(cols.flatMap(c => Seq(c.isNull.cast("int"), c)): _*)): _*)
    val agg = udaf(new Agg(subsets.length),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    df.select(hashes.as("h")).agg(agg(col("h"))).head()
      .getSeq[Double](0)
  }
}

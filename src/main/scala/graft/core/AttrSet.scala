package graft.core

import scala.collection.immutable.BitSet

/** Immutable attribute set over positional attribute indices `0 until n`.
  *
  * Mirrors the operations of the reference's bitset wrapper
  * (`common/sets/AttributeSet.java:10-247` in /root/reference) as a thin
  * value class over `scala.collection.immutable.BitSet`. All mining /
  * inference combinatorics in this engine run on the driver over these
  * sets; they touch Spark only when an [[graft.entropy.EntropyEngine]]
  * query is issued for the columns they select.
  */
final case class AttrSet(bits: BitSet) extends Ordered[AttrSet] {
  def union(o: AttrSet): AttrSet = AttrSet(bits | o.bits)
  def intersect(o: AttrSet): AttrSet = AttrSet(bits & o.bits)
  def minus(o: AttrSet): AttrSet = AttrSet(bits &~ o.bits)
  def complement(n: Int): AttrSet = AttrSet(BitSet(0 until n: _*) &~ bits)
  def +(i: Int): AttrSet = AttrSet(bits + i)
  def -(i: Int): AttrSet = AttrSet(bits - i)
  def contains(i: Int): Boolean = bits(i)
  def subsetOf(o: AttrSet): Boolean = bits.subsetOf(o.bits)
  def properSubsetOf(o: AttrSet): Boolean = bits.subsetOf(o.bits) && bits != o.bits
  def intersects(o: AttrSet): Boolean = (bits & o.bits).nonEmpty
  def disjoint(o: AttrSet): Boolean = (bits & o.bits).isEmpty
  def isEmpty: Boolean = bits.isEmpty
  def nonEmpty: Boolean = bits.nonEmpty
  def size: Int = bits.size
  def toSeq: Seq[Int] = bits.toSeq

  /** Column names `att{i}` for hitting a DataFrame encoded by
    * [[graft.data.Ingest]], in ascending attribute order.
    */
  def colNames: Seq[String] = bits.toSeq.map(i => s"att$i")

  /** Reference-parity rendering: `{i, j, ...}` (ascending). */
  override def toString: String = bits.mkString("{", ", ", "}")

  /** Stable total order: by cardinality then lexicographic on indices. */
  override def compare(that: AttrSet): Int = {
    val c = size.compareTo(that.size)
    if (c != 0) c
    else {
      val it1 = bits.iterator; val it2 = that.bits.iterator
      while (it1.hasNext && it2.hasNext) {
        val d = it1.next().compareTo(it2.next())
        if (d != 0) return d
      }
      0
    }
  }
}

object AttrSet {
  val empty: AttrSet = AttrSet(BitSet.empty)
  def apply(is: Int*): AttrSet = AttrSet(BitSet(is: _*))
  def of(is: Iterable[Int]): AttrSet = AttrSet(BitSet.fromSpecific(is))
  def full(n: Int): AttrSet = AttrSet(BitSet(0 until n: _*))
  def single(i: Int): AttrSet = AttrSet(BitSet(i))

  /** All non-empty subsets of `full(n)` — for exhaustive small-n oracles. */
  def allNonEmptySubsets(n: Int): Seq[AttrSet] = {
    require(n <= 20, s"2^$n subsets is too many")
    (1 until (1 << n)).map { mask =>
      AttrSet.of((0 until n).filter(i => (mask & (1 << i)) != 0))
    }
  }
}

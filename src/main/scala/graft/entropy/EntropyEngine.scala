package graft.entropy

import graft.core.{AttrSet, Jd, Measure}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The engine's single data-query primitive: Shannon entropy `H(X)` of
  * the distinct value combinations of a column subset X.
  *
  * Reference semantics (`entropy/AbstractDataset.java:187-207` in
  * /root/reference): `H(X) = -sum_v p(v) log2 p(v)` with `p(v) = c_v / N`,
  * N = raw row count; total entropy `H(R) = log2(N)`; trivial shortcuts
  * `H(empty) = 0`, `H(full) = log2 N`. We compute the numerically
  * equivalent `H = log2(N) - (1/N) * sum_v c_v * log2(c_v)`, which needs
  * one aggregate over the group counts.
  *
  * Spark shape: each uncached entropy is `df.groupBy(cols).count()` +
  * a scalar aggregate — exact (the reference's in-memory path groups by a
  * 32-bit hash and can merge distinct groups on collision; SURVEY §4
  * documents the divergence). Batches of subsets share ONE scan + shuffle
  * via GROUP BY GROUPING SETS (the Spark analogue of the reference's
  * multi-subset shared file scan, `entropy/ExternalFileDataSet.java:91-166`).
  *
  * Driver-side memoization (a reference "optimization" Catalyst cannot
  * see across queries) fronts everything; mining issues thousands of tiny
  * entropy queries and the memo + batching keep that tractable.
  *
  * Scale notes: groupBy on a column subset shuffles only the projected
  * columns (dictionary-encoded ints), with map-side partial aggregation;
  * the grouping-sets batch multiplies rows by the batch size before the
  * shuffle, so batches are chunked (`maxBatch`). The input `df` should be
  * cached by the caller when many entropies will be asked.
  */
final class EntropyEngine(val df: DataFrame, precomputedN: Option[Long] = None) {

  /** Attribute i = df.columns(i). */
  val attrNames: Array[String] = df.columns
  val numAttrs: Int = attrNames.length
  val fullSet: AttrSet = AttrSet.full(numAttrs)

  /** Raw row count (entropy-path semantics; duplicates count). */
  lazy val numRows: Long = precomputedN.getOrElse(df.count())

  /** `H(R) = log2 N` (`entropy/AbstractDataset.java:203-207`). */
  lazy val totalEntropy: Double = log2(numRows.toDouble)

  // concurrent: the async decomposition service and any embedding caller
  // may share one engine across threads (worst case under a race is a
  // duplicated — still correct — Spark job)
  private val memo = scala.collection.concurrent.TrieMap.empty[AttrSet, Double]
  // telemetry (the reference reports #queries / #cached entropies)
  private val queriesIssued = new java.util.concurrent.atomic.AtomicLong()
  private val cacheHits = new java.util.concurrent.atomic.AtomicLong()
  def numQueriesIssued: Long = queriesIssued.get()
  def numCacheHits: Long = cacheHits.get()

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  private def colsOf(x: AttrSet): Seq[Column] = x.toSeq.map(i => col(attrNames(i)))

  def cachedEntropies: Int = memo.size

  /** Entropy of one subset, memoized. */
  def entropy(x: AttrSet): Double = {
    if (x.isEmpty) return 0.0
    memo.get(x) match {
      case Some(h) => cacheHits.incrementAndGet(); h
      case None =>
        if (x == fullSet) { memo(x) = totalEntropy; return totalEntropy }
        queriesIssued.incrementAndGet()
        val h = entropyJob(x)
        memo(x) = h
        h
    }
  }

  private def entropyJob(x: AttrSet): Double = {
    // sum over groups of c*log2(c); H = log2(N) - that/N
    val s = df.groupBy(colsOf(x): _*).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt").cast("double") * log(2.0, col("cnt")))).head()
    val sumClogC = if (s.isNullAt(0)) 0.0 else s.getDouble(0)
    totalEntropy - sumClogC / numRows
  }

  /** Sparse-count variant (reference A4/A5/P6,
    * `entropy/CompressedDB.java:270-346`): drop singleton groups with
    * `HAVING cnt > 1` before the final aggregate and reconstruct their
    * contribution analytically — `1*log2(1) = 0`, so the correction term
    * vanishes in this formulation and the filter only shrinks the
    * aggregate's input (the reference stores sparse CNT tables for the
    * same reason). Result is identical to [[entropy]]; kept as a
    * separate path for inventory parity and as the shape to prefer when
    * group counts are heavily skewed toward singletons.
    */
  def entropySparse(x: AttrSet): Double = {
    if (x.isEmpty) return 0.0
    queriesIssued.incrementAndGet()
    val s = df.groupBy(colsOf(x): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(sum(col("cnt").cast("double") * log(2.0, col("cnt")))).head()
    val sumClogC = if (s.isNullAt(0)) 0.0 else s.getDouble(0)
    totalEntropy - sumClogC / numRows
  }

  /** One-pass multi-subset entropies via the custom aggregate
    * ([[MultiSubsetEntropy]]): ONE scan with per-subset count maps and no
    * Expand row-multiplication, the reference's shared-scan profile. Use
    * for many low-cardinality subsets; [[entropies]] (GROUPING SETS)
    * remains the default and the exact path for key-like subsets.
    */
  def entropiesOnePass(sets: Seq[AttrSet]): Map[AttrSet, Double] = {
    val pending = sets.filter(s => s.nonEmpty && s != fullSet && !memo.contains(s)).distinct
    if (pending.nonEmpty) {
      queriesIssued.incrementAndGet()
      val sums = MultiSubsetEntropy.sumClogC(df, pending.map(colsOf))
      pending.zip(sums).foreach { case (x, s) =>
        memo(x) = totalEntropy - s / numRows
      }
    }
    sets.map(s => s -> entropy(s)).toMap
  }

  /** C4 parity: pre-warm the memo with every (n-1)- and (n-2)-subset
    * entropy (the "most specific separators" the JD miners probe first),
    * as shared-scan batches (`entropy/MasterCompressedDB.java:53-69`).
    */
  def precomputeMostSpecific(): Unit = {
    val n = numAttrs
    val sets =
      (0 until n).map(fullSet - _) ++
        (for (i <- 0 until n; j <- i + 1 until n) yield fullSet - i - j)
    prefetch(sets)
  }

  /** C5 parity: the full entropy lattice (all non-empty subsets),
    * batched. Exponential in the attribute count — callers guard n.
    */
  def allEntropies(maxBatch: Int = 16): Map[AttrSet, Double] =
    entropies(AttrSet.allNonEmptySubsets(numAttrs), maxBatch)

  /** Ensure all of `sets` are memoized, sharing scans: uncached subsets
    * are grouped into GROUPING SETS batches of `maxBatch`, one Spark job
    * per batch (one scan + one shuffle each).
    */
  def prefetch(sets: Iterable[AttrSet], maxBatch: Int = 16): Unit = {
    val pending = sets.iterator
      .filter(s => s.nonEmpty && s != fullSet && !memo.contains(s))
      .toSeq.distinct
    pending.grouped(maxBatch).foreach(batchJob)
  }

  /** Entropies of many subsets (memo + shared-scan batches). */
  def entropies(sets: Seq[AttrSet], maxBatch: Int = 16): Map[AttrSet, Double] = {
    prefetch(sets, maxBatch)
    sets.map(s => s -> entropy(s)).toMap
  }

  private def batchJob(batch: Seq[AttrSet]): Unit = {
    if (batch.isEmpty) return
    if (batch.length == 1) { entropy(batch.head); return }
    queriesIssued.incrementAndGet()
    val unionCols: Seq[Int] = batch.foldLeft(AttrSet.empty)(_ union _).toSeq
    val pos = unionCols.zipWithIndex.toMap // attr -> bit position (left-to-right)
    val nCols = unionCols.length
    // grouping_id() bit for column j (in groupingSets column order) is
    // 2^(nCols-1-j), set when the column is AGGREGATED (not in the set)
    def gidOf(x: AttrSet): Long =
      unionCols.zipWithIndex.foldLeft(0L) { case (g, (a, j)) =>
        if (x.contains(a)) g else g | (1L << (nCols - 1 - j))
      }
    val gidToSet = batch.map(x => gidOf(x) -> x).toMap
    require(gidToSet.size == batch.size, "duplicate subsets in batch")
    val gcols = unionCols.map(i => col(attrNames(i)))
    val rows = df
      .groupingSets(batch.map(x => x.toSeq.map(i => col(attrNames(i)))), gcols: _*)
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"))
      .groupBy(col("gid"))
      .agg(sum(col("cnt").cast("double") * log(2.0, col("cnt"))).as("s"))
      .collect()
    rows.foreach { r =>
      val gid = r.getLong(0)
      gidToSet.get(gid).foreach { x =>
        val sumClogC = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
        memo(x) = totalEntropy - sumClogC / numRows
      }
    }
  }

  // ---- Dependency measures (entropy/AbstractDataset.java:94-277) ----

  private def clampZero(m: Double): Double =
    if (math.abs(m) < Measure.ZeroClamp) 0.0 else m

  /** FD measure `H(X u Y) - H(X)`; 0 iff X -> Y holds exactly. */
  def fdMeasure(lhs: AttrSet, rhs: AttrSet): Double =
    clampZero(entropy(lhs.union(rhs)) - entropy(lhs))

  /** MVD measure `I(Y ; R-X-Y | X) = H(XY) + H(R-Y) - H(R) - H(X)`
    * (with Y taken modulo X); 0 iff X ->> Y holds exactly.
    */
  def mvdMeasure(lhs: AttrSet, rhs: AttrSet): Double = {
    val y = rhs.minus(lhs)
    val m = entropy(lhs.union(y)) + entropy(fullSet.minus(y)) -
      totalEntropy - entropy(lhs)
    clampZero(m)
  }

  /** JD measure `sum_i H(lhs u C_i) - (k-1) H(lhs) - H(R)`, clamped at 0
    * from below (`entropy/AbstractDataset.java:244-277`).
    */
  def jdMeasure(jd: Jd): Double = {
    val k = jd.numComponents
    prefetch(jd.clusters :+ jd.lhs)
    val m = jd.clusters.map(entropy).sum - (k - 1) * entropy(jd.lhs) - totalEntropy
    clampZero(math.max(m, 0.0))
  }

  /** Conditional mutual information `I(A ; B | C)` for disjoint sets —
    * the pairwise merge test of the JD miners.
    */
  def condMutualInfo(a: AttrSet, b: AttrSet, c: AttrSet): Double = {
    val m = entropy(a.union(c)) + entropy(b.union(c)) -
      entropy(a.union(b).union(c)) - entropy(c)
    clampZero(m)
  }
}

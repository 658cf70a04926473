package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics expressed as iterative DataFrame joins — the shape
  * that scales: each PageRank iteration is one shuffle-join of the
  * normalized edge table with the current rank vector plus one
  * map-side-combinable aggregate on the destination key. No driver-side
  * adjacency, no windowing; a 100 TB edge table just makes the joins
  * bigger. (Connected components for dedup clusters live in
  * [[Dedup]]; this file is for weighted-propagation analytics.)
  */
object Graph {

  /** `iters` unrolled PageRank iterations over a weighted digraph.
    *
    * pr_0(v) = 1/N;
    * pr_{t+1}(v) = teleport/N + damping * sum_u pr_t(u) * w(u,v)/outW(u).
    *
    * `damping` and `teleport` are BOTH caller-supplied literals rather
    * than deriving teleport = 1 − damping: the binary subtraction can
    * land half an ulp from the decimal literal an oracle parses, and an
    * iterated recurrence amplifies that seed. Nodes with no out-edges
    * leak their mass (the classic simplification); nodes with no
    * in-edges settle at teleport/N. Ranks round to 6dp only at the end —
    * per-node in-sums are short, so cross-engine summation-order drift
    * stays far below the rounding grain.
    *
    * Scale shape: `nodes` and the rank vector are node-domain-sized;
    * the per-iteration cost is one join of edges with ranks on `src`
    * (both hash-partitioned on the node key — AQE reuses the exchange)
    * and one combinable sum on `dst`. The normalized edge table is
    * computed once and cached by Catalyst plan reuse across the
    * unrolled iterations; for deep iteration counts checkpoint the rank
    * vector instead of unrolling.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, damping: Double, teleport: Double,
               iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0 && damping < 1 && teleport > 0 && teleport < 1,
      s"need damping, teleport in (0,1), got ($damping, $teleport)")
    // materialized: the edge table is read by every iteration (plus the
    // node/out-weight derivations) — without this, an expensive upstream
    // (e.g. a windowed transition extraction) re-runs once per use
    val e = graft.data.ScopedCaches.materialize(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nCnt = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("__outw"))
    val p = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("__outw")).as("p"))
    var pr = nodes.crossJoin(broadcast(nCnt))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    for (_ <- 1 to iters) {
      val mass = p.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("p") * col("pr")).as("__mass"))
      pr = nodes.crossJoin(broadcast(nCnt))
        .join(mass.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) / col("__n") +
            lit(damping) * coalesce(col("__mass"), lit(0d))).as("pr"))
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }
}

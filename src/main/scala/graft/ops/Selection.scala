package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-weighted data selection in the style of DSIR (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): every document is scored by the log-likelihood ratio
  * of its hashed token-bucket features under a TARGET distribution
  * (documents matching a caller-supplied predicate — e.g. a trusted
  * high-quality slice) versus the RAW corpus distribution, and the
  * top-k scoring documents are selected. This is the published recipe
  * for "pick web documents that look like the target corpus" without
  * training a classifier.
  *
  * Determinism/portability: the feature hash is the pinned
  * `md5(salt:token)` convention used across this codebase (no
  * engine-private hash), so any engine with md5 replays the bucket
  * assignment, the bucket distributions, and therefore the scores and
  * the selected SET bit-for-bit (scores rounded to 6 decimals before
  * ranking, doc id as tie-break → a well-defined total order).
  *
  * Scale shape: the token stream is exploded once per consumer (two
  * scans — bucket histogram, then per-doc rescore; recomputing beats
  * caching a stream ~10× the corpus size). The histogram aggregation
  * is map-side combinable down to `buckets` rows per partition; the
  * per-bucket log-ratio table is `buckets` rows and broadcasts back
  * onto the token stream, so the only corpus-sized shuffle is the
  * per-doc regroup. The selection threshold is a top-k
  * (TakeOrderedAndProject — per-partition heaps, no global sort)
  * reduced to ONE row and broadcast as a scan-side predicate.
  */
object Selection {

  /** Pinned portable token bucket: first 8 hex chars of
    * `md5("salt:token")` as an integer mod `buckets` — the same
    * convention as [[Sketches.cmsBucket]], replayable in SQL as
    * `CAST('0x' || substr(md5(salt || ':' || tok), 1, 8) AS BIGINT) % buckets`.
    */
  def tokenBucket(tok: Column, buckets: Int, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), tok)), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-document DSIR log-ratio scores.
    *
    * Output: (idCol, is_target, n_toks, dsir_score) for EVERY input
    * document; `dsir_score` = Σ_tokens [ln p̂_target(bucket) −
    * ln p̂_raw(bucket)] with add-one smoothing over `buckets` cells,
    * rounded to 6 decimals. Documents with no tokens score 0.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 1024,
                 salt: String = "dsir"): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val toks = df
      .select(col(idCol), isTarget.cast("boolean").as("__tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(idCol), col("__tgt"),
        tokenBucket(col("__tok"), buckets, salt).as("__b"))
    // one aggregation yields BOTH distributions (target ⊆ raw)
    val cells = toks.groupBy("__b")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("t_cnt"),
        count(lit(1)).as("r_cnt"))
    val totals = cells.agg(sum("t_cnt").as("t_tot"), sum("r_cnt").as("r_tot"))
    val ratios = cells.crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((col("t_cnt") + 1.0) / (col("t_tot") + buckets)) -
          log((col("r_cnt") + 1.0) / (col("r_tot") + buckets))).as("__lr"))
    val scored = toks.join(broadcast(ratios), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("__lr")), 6).as("dsir_score"))
    df.select(col(idCol), isTarget.cast("boolean").as("is_target"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** [[dsirScores]] plus a `selected` flag marking the top-k documents
    * by (dsir_score desc, id asc). The cut is computed as the MINIMUM
    * order-key among the top-k (one TakeOrderedAndProject + a 1-row
    * aggregate) and broadcast back as a scan-side comparison — never a
    * global-order window over the corpus. With fewer than k documents
    * everything is selected.
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, buckets: Int = 1024,
                 salt: String = "dsir"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val scored = dsirScores(df, idCol, textCol, isTarget, buckets, salt)
    def ordKey(d: DataFrame): Column =
      struct(d("dsir_score").as("s"), (-d(idCol)).as("nid"))
    val bound = scored
      .orderBy(col("dsir_score").desc, col(idCol).asc).limit(k)
      .agg(min(struct(col("dsir_score").as("s"), (-col(idCol)).as("nid")))
        .as("__bound"))
    scored.crossJoin(broadcast(bound))
      .select(col(idCol), col("is_target"), col("n_toks"),
        col("dsir_score"),
        (ordKey(scored) >= col("__bound")).as("selected"))
  }
}

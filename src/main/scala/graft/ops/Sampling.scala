package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * The keep decision is `md5(salt:key)` compared lexicographically
  * against an 8-hex-digit threshold — a pure per-row predicate: no RNG
  * state, no shuffle, reproducible across runs, engines (any md5
  * produces the same lowercase hex), cluster layouts, and incremental
  * re-runs (a row's fate never depends on which batch it arrived in —
  * the property `DataFrame.sample` cannot give you). Selectivity is
  * `round(rate * 2^32) / 2^32`, exact over the uniform first 8 hex
  * chars of md5.
  */
object Sampling {

  /** 8-hex-digit threshold with P(md5_hex < threshold) = rate (md5 hex
    * is 32 chars, so prefix-equal comparisons resolve to "longer string
    * sorts after" — the boundary digest itself is excluded).
    */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val t = math.min((rate * 4294967296.0).round, 4294967296L)
    if (t >= 4294967296L) "ffffffffg" // > every hex digest: keep all
    else f"$t%08x"
  }

  /** The keep predicate for a uniform deterministic sample of `rate`. */
  def keepExpr(key: Column, rate: Double, salt: String): Column =
    md5(concat(lit(salt), lit(":"), key.cast("string"))) < lit(hexThreshold(rate))

  /** Uniform deterministic sample: keep ~`rate` of rows keyed by
    * `keyCol`. Distinct `salt` values draw independent samples.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "s"): DataFrame =
    df.filter(keepExpr(col(keyCol), rate, salt))

  /** Fixed-BUDGET deterministic sample: keep ~`targetRows` rows
    * regardless of corpus size, by deriving `rate = min(1, target/n)`
    * from one count. This is the scale-safe front of the exact
    * quadratic diagnostics: a fixed RATE merely delays an O(n²)
    * stage (0.25²·n² is still quadratic), a fixed BUDGET caps it at
    * O(target²) forever. Still fully oracle-replayable — the oracle
    * derives the same 8-hex-digit threshold from its own count(*)
    * (`printf('%08x', round(least(1, t/n)·2³²))`), so the selected SET
    * replays engine-independently. Costs one count job.
    */
  def hashSampleBudget(df: DataFrame, keyCol: String, targetRows: Long,
                       salt: String = "s"): DataFrame = {
    require(targetRows >= 1, s"need targetRows >= 1, got $targetRows")
    val n = df.count()
    hashSample(df, keyCol, math.min(1.0, targetRows.toDouble / n), salt)
  }

  /** Deterministic train/val/test split assignment: every row gets a
    * split label from consecutive hash bands — `fractions` are
    * (label, rate) in priority order, remainder goes to the last label.
    * Same portability story as [[hashSample]]: a doc's split never
    * changes as the corpus grows (critical — a doc migrating from train
    * to test across snapshots is silent eval contamination), and any
    * engine recomputes the same assignment. Scan-side CASE, no shuffle.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split label")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = md5(concat(lit(salt), lit(":"), col(keyCol).cast("string")))
    val cuts = fractions.init.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val label = fractions.init.zip(cuts).foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), rest) =>
        when(h < lit(hexThreshold(cut)), lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws u ∈ (0,1] from the pinned md5 hash
    * of its key and competes with priority u^(1/w); the k highest
    * priorities are a weighted sample where inclusion probability is
    * proportional to weight, exactly as if drawn sequentially without
    * replacement. Same portability story as [[hashSample]] — no RNG
    * state, any engine replays the draw — plus a total order (priority
    * desc, key asc) so the selected SET is well-defined.
    *
    * Scale: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
    * per-partition top-k heaps merged on the driver, never a global
    * sort shuffle. k drives memory, not N.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int,
                     salt: String = "w"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(
      md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))), 1, 8),
      16, 10).cast("double")
    val u = (h + 1.0) / 4294967296.0 // (0,1]: u=0 would zero every priority
    // E-S priorities are defined for w > 0 only; a negative w makes
    // u^(1/w) >= 1 (outranking every valid row) and w = 0 with u = 1
    // yields NaN, which desc-sorts FIRST — filter rather than corrupt.
    // w <= 0 therefore means "never sampled", the natural limit.
    df.filter(weight.cast("double") > 0.0)
      .withColumn("pri", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("pri").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Stratified deterministic sample: per-stratum rates (the
    * "downsample over-represented sources, keep all of the rare ones"
    * corpus-mixing step), `defaultRate` for strata not in the map. One
    * codegen'd scan-side filter — no shuffle, no per-stratum pass.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double], defaultRate: Double,
                           salt: String = "s"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultRate))) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(
      md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) < threshold)
  }

  /** Temperature-based mixture resampling (the multilingual-pretraining
    * α-sampling of Conneau & Lample 2019 / XLM-R): downsample each
    * group so the kept mixture is proportional to n_g^α instead of
    * n_g — α=1 keeps the natural mixture, α→0 approaches uniform,
    * and intermediate α (0.3–0.7 in the published recipes) boosts
    * low-resource groups without flattening entirely. Scaled so the
    * smallest group is kept whole: rate_g = (n_min/n_g)^(1−α) ≤ 1,
    * which makes [[rebalanceGroups]] the α=0 special case.
    *
    * Same execution shape as [[rebalanceGroups]]: rates derived
    * IN-plan from a broadcast group-count aggregate, keep decided by
    * the pinned md5 draw — scan-side, no shuffle of the corpus.
    * α=0.5 is computed via `sqrt`, which IEEE-754 requires to be
    * correctly rounded — bit-identical in any engine, so the kept SET
    * is hash-gateable; other α go through `pow`, whose last-ulp
    * behavior is libm-specific (fine for production, not for a
    * cross-engine replay gate).
    */
  def temperatureResample(df: DataFrame, keyCol: String, groupCol: String,
                          alpha: Double, salt: String = "temp"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__mn"))
    val base = col("__mn").cast("double") / col("__n").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(base)
      else if (alpha == 0.0) base
      else pow(base, lit(1.0 - alpha))
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(minN))
      .filter(rate >= 1.0 ||
        md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) < thr)
      .drop("__n", "__mn")
  }

  /** Rebalance a skewed corpus to a UNIFORM group mixture — the
    * dataset-mixing step that downsamples over-represented
    * languages/sources to the smallest group's size: rate_g =
    * min_h(n_h) / n_g, keep decided by the same pinned md5 draw as
    * [[hashSample]]. Unlike [[stratifiedHashSample]], the rates are
    * derived FROM the data inside the plan — one tiny group-count
    * aggregate broadcast back onto the scan, no driver collect, no
    * precomputed rate table to drift out of date.
    *
    * The per-group threshold is `floor(rate * 2^32)` rendered as the
    * 8-hex-digit string the digest is compared against (floor, not
    * round: identical IEEE semantics in any engine, where half-up vs
    * half-even rounding could disagree on a boundary). The smallest
    * group has rate exactly 1.0 and is kept wholesale via an explicit
    * guard — its 9-hex-digit threshold would otherwise compare
    * lexicographically WRONG against 8-char digest prefixes.
    */
  def rebalanceGroups(df: DataFrame, keyCol: String, groupCol: String,
                      salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__mn"))
    val rate = col("__mn").cast("double") / col("__n").cast("double")
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    df.join(broadcast(counts), Seq(groupCol))
      .crossJoin(broadcast(minN))
      .filter(rate >= 1.0 ||
        md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) < thr)
      .drop("__n", "__mn")
  }

  /** Token-budget mixture allocation: downsample each group so the kept
    * corpus hits `budgetTokens` total tokens split by the target
    * `weights` — the production form of dataset mixing, where a training
    * mix is specified in TOKENS per source ("30% en, 17.5% each of the
    * rest, 1T total"), not in documents. Per group,
    * `rate_g = min(1, budgetTokens·w_g / availTokens_g)` — a group with
    * fewer tokens than its allocation is kept wholesale (the shortfall
    * is reported, not silently reassigned); groups absent from `weights`
    * get rate 0 and are dropped. Selection is at document granularity
    * via the pinned md5 draw, so the budget is hit in expectation; the
    * kept SET is exact and replayable. Emits kept rows as
    * (`keyCol`, `groupCol`, `n_toks`, `rate` 6dp).
    *
    * Scale shape: one map-side-combinable per-group token-sum aggregate
    * (groups-sized, broadcast back), weights as a scan-side CASE chain
    * (pinned config — no join), keep decision a pure per-row predicate.
    * One pass over the corpus plus a broadcast; no shuffle of the data.
    */
  def tokenBudgetMix(df: DataFrame, keyCol: String, groupCol: String,
                     textCol: String, weights: Seq[(String, Double)],
                     budgetTokens: Long,
                     salt: String = "budget"): DataFrame = {
    require(weights.nonEmpty, "need at least one (group, weight)")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val nToks = TextAnalysis.tokenCount(col(textCol))
    val avail = df.select(col(groupCol), nToks.as("__t"))
      .groupBy(groupCol).agg(sum(col("__t")).as("__avail"))
    val w = weights.tail.foldLeft(
      when(col(groupCol) === weights.head._1, lit(weights.head._2))) {
        case (acc, (g, wt)) => acc.when(col(groupCol) === g, lit(wt))
      }.otherwise(lit(0.0))
    val rate = least(lit(1.0),
      lit(budgetTokens.toDouble) * w / col("__avail"))
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    df.join(broadcast(avail), Seq(groupCol))
      .filter(rate >= 1.0 ||
        md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) < thr)
      .select(col(keyCol), col(groupCol), nToks.as("n_toks"),
        round(rate, 6).as("rate"))
  }

  /** Temperature-α source MIXING with normalized weights — the
    * data-mixing step between uniform rebalancing and packing: the
    * target mixture gives source g weight `w_g = n_g^α / Σ_h n_h^α`
    * (α=1 natural mixture, α→0 uniform; Conneau & Lample 2019's
    * α-sampling stated as weights rather than keep-rates), and the
    * realized sample of `targetRows` documents draws each source at
    * `rate_g = min(1, targetRows·w_g / n_g)` via the pinned md5 draw.
    * Differs from [[temperatureResample]] (whose contract is
    * "smallest group kept whole", no target size): here the SIZE is
    * the contract and the mixture is renormalized across sources —
    * the form a training-run config actually specifies ("50M docs at
    * α=0.5 over sources"). A source whose allocation exceeds its
    * supply is kept whole (rate capped at 1) and the mixture falls
    * short of target for that source — reported via the emitted
    * `rate` column, never silently reassigned (same contract as
    * [[tokenBudgetMix]]).
    *
    * Determinism (the cross-engine replay contract): n_g^α at the
    * registered α=0.5 is `sqrt` — correctly rounded per IEEE-754 in
    * every engine (other α ride `pow`: fine for production, not for a
    * hash gate). Each per-source sqrt is pinned to a ×10⁹ BIGINT
    * before the normalizer sums them, so Σ_h n_h^α is an exact
    * integer in any aggregation order; w_g and rate_g are then single
    * fixed-order double expressions over exact integers, and the keep
    * threshold is the repo-standard `floor(rate·2³²)` hex compare.
    *
    * Scale shape: one map-side-combinable group-count aggregate
    * (sources-sized) + its one-row normalizer, both broadcast back
    * onto the scan; the keep decision is a pure per-row predicate —
    * no shuffle of the corpus, identical to [[rebalanceGroups]].
    * Emits kept rows as (`keyCol`, `groupCol`, `mix_w` 6dp, `rate`
    * 6dp).
    */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     alpha: Double, targetRows: Long,
                     salt: String = "tmix"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val nAlpha =
      if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else if (alpha == 0.0) lit(1.0)
      else if (alpha == 1.0) col("__n").cast("double")
      else pow(col("__n").cast("double"), lit(alpha))
    // the normalizer is an unpartitioned window SUM over the
    // sources-sized count table (not a re-aggregate + crossJoin of the
    // same lineage, which trips AMBIGUOUS_REFERENCE dedup): the window
    // input is |sources| rows, so the single partition is free
    // __wa9/__wt9, not __s9/__S9: column resolution is
    // case-INsensitive, so those two names would silently collide
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__wa9", round(nAlpha * 1e9).cast("long"))
      .withColumn("__wt9", sum(col("__wa9")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val w = col("__wa9").cast("double") / col("__wt9").cast("double")
    val rate = least(lit(1.0),
      lit(targetRows.toDouble) * w / col("__n").cast("double"))
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    df.join(broadcast(counts), Seq(groupCol))
      .filter(rate >= 1.0 ||
        md5(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) < thr)
      .select(col(keyCol), col(groupCol),
        round(w, 6).as("mix_w"), round(rate, 6).as("rate"))
  }

  /** Temperature-mixing PLANNING curve — the α sweep read before fixing
    * [[temperatureMix]]'s temperature: one row per (α, source) with the
    * mixture weight, realized keep-rate, the EXACT number of documents
    * the pinned md5 draw would keep at that α (same salt convention as
    * the mixing op — this is the realized plan, not an estimate), and
    * two per-α mixture summaries: the Kish effective source count
    * ESS = (Σw)²/Σw² (how many equal-weight sources the mixture is
    * worth — 1 ≈ monoculture, |sources| ≈ uniform) and the largest
    * source's share. α is restricted to the QUARTER grid
    * {0, 0.25, 0.5, 0.75, 1}: n^(k/4) factors into nested `sqrt`s —
    * correctly rounded per IEEE-754 in every engine, unlike `pow`,
    * which [[temperatureMix]]'s own contract rejects for hash gates —
    * and the α values themselves are dyadic, so even the α column
    * round-trips bit-exactly. Each n^α is ×10⁹-BIGINT-pinned before
    * the per-α normalizer sums it (order-free); ESS squares sum in
    * DECIMAL(38,0); every emitted double is one fixed-order expression
    * over exact integers, rounded 6dp.
    *
    * Scale shape: one sources-sized count aggregate reused across the
    * α grid (a ≤ 5·|sources|-row table), and ONE corpus scan joined to
    * that broadcast grid for the exact kept-counts — a combinable
    * count, no corpus shuffle, |grid|× scan-side row expansion only.
    */
  def temperatureMixPlan(df: DataFrame, keyCol: String, groupCol: String,
                         targetRows: Long,
                         alphas: Seq[Double] = Seq(0.0, 0.25, 0.5, 0.75, 1.0),
                         salt: String = "tmix"): DataFrame = {
    val quarters = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    require(alphas.nonEmpty && alphas.forall(quarters.contains),
      s"alphas must be on the quarter grid $quarters, got $alphas")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    def nAlpha(a: Double): Column = a match {
      case 0.0 => lit(1.0)
      case 0.25 => sqrt(sqrt(nD))
      case 0.5 => sqrt(nD)
      case 0.75 => sqrt(nD) * sqrt(sqrt(nD))
      case _ => nD
    }
    val grid = alphas.map(a => counts
        .withColumn("alpha", lit(a))
        .withColumn("__wa9", round(nAlpha(a) * 1e9).cast("long")))
      .reduce(_.unionByName(_))
    val byA = org.apache.spark.sql.expressions.Window.partitionBy("alpha")
    val dec = "decimal(38,0)"
    val planned = grid
      .withColumn("__wt9", sum(col("__wa9")).over(byA))
      .withColumn("__sq", sum(col("__wa9").cast(dec) *
        col("__wa9").cast(dec)).over(byA))
      .withColumn("__mx9", max(col("__wa9")).over(byA))
    val w = col("__wa9").cast("double") / col("__wt9").cast("double")
    val rate = least(lit(1.0),
      lit(targetRows.toDouble) * w / col("__n").cast("double"))
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    val plan = planned.withColumn("__thr", thr).withColumn("__rate", rate)
    val kept = df.select(col(keyCol).as("__k"), col(groupCol))
      .join(broadcast(plan.select(col(groupCol), col("alpha"),
        col("__thr"), col("__rate"))), Seq(groupCol))
      .filter(col("__rate") >= 1.0 ||
        md5(concat(lit(salt), lit(":"), col("__k").cast("string"))) <
          col("__thr"))
      .groupBy(col(groupCol), col("alpha"))
      .agg(count(lit(1)).as("kept_docs"))
    plan.join(kept, Seq(groupCol, "alpha"), "left")
      .select(col("alpha"), col(groupCol), col("__n").as("n_docs"),
        round(w, 6).as("mix_w"), round(rate, 6).as("rate"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        round((col("__wt9").cast("double") * col("__wt9").cast("double")) /
          col("__sq").cast("double"), 6).as("ess_sources"),
        round(col("__mx9").cast("double") / col("__wt9").cast("double"), 6)
          .as("max_share"))
  }

  /** Neyman-allocation stratified sampling (Neyman 1934): a total
    * budget of `budget` rows split across strata proportionally to
    * N_h·σ_h — variance-heavy strata get more samples, which minimizes
    * the estimator variance for a fixed budget (proportional
    * allocation is what people do; Neyman is what they should do when
    * within-stratum spread differs). σ_h is the population stddev of
    * `valueCol` from exact integer moments; the realized sample takes
    * each stratum's top-n_h rows by pinned md5 rank, so the draw
    * replays exactly. A stratum allocated more than it has simply
    * yields all its rows.
    *
    * Determinism: per-stratum (N, Σx, Σx²) are exact BIGINTs; σ =
    * √(NΣx²−(Σx)²)/N with the radicand exact; the weights N·σ are
    * 6dp-pinned to BIGINTs before the (exact) total, and each
    * allocation is one rounded divide of exact integers. Output per
    * stratum: population size, σ, allocated n, realized n, and the
    * realized-sample mean of the value (exact-integer ratio).
    *
    * Scale shape: one moment aggregate (combinable); the per-stratum
    * rank is a window partitioned by stratum keyed on the md5 draw —
    * the one shuffle of the realized pass.
    */
  /** UniMax token-budget allocation (Chung et al. 2023): spread a
    * total token budget as UNIFORMLY as possible across sources,
    * capping every source at `maxEpochs` passes over its own tokens —
    * the published fix for temperature mixing's twin failure modes
    * (low T starves tail languages, high T epochs tiny ones into
    * memorization). Water-filling: sources ascending by capacity
    * c_g = maxEpochs·n_g; a source saturates (gets exactly c_g) while
    * the running equal share of the remaining budget still exceeds
    * its capacity; every larger source gets the common level λ. When
    * total capacity ≤ budget every source saturates and the budget is
    * deliberately under-spent — UniMax never epochs past the cap.
    *
    * Determinism: n_g and c_g are exact BIGINTs; the saturation test
    * is the integer cross-multiplication `c_i·(k−i+1) < B − pfx_{i−1}`
    * (no division anywhere near the predicate); λ is ONE rounded
    * divide of exact integers; `epochs`/`share` are 6dp-rounded
    * fixed-order doubles on exact integers. Output per source:
    * (`groupCol`, n_tokens, capacity_tokens, saturated, alloc_tokens,
    * epochs, share).
    *
    * Scale shape: one combinable token-count aggregate is the only
    * corpus pass; everything after runs on the ≤|sources|-row table
    * (two unpartitioned windows over domain-sized rows — free, same
    * acknowledgment class as `doc_temperature_mix`).
    */
  def unimaxPlan(df: DataFrame, groupCol: String, textCol: String,
                 budgetTokens: Long, maxEpochs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val counts = df
      .select(col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__t"))
      .groupBy(groupCol).agg(sum(col("__t")).as("n_tokens"))
    val wOrd = Window.orderBy(col("__cap").asc, col(groupCol).asc)
    val wAll = Window.partitionBy()
    val t = counts
      .withColumn("__cap", col("n_tokens") * maxEpochs)
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__pfx", sum(col("__cap")).over(wOrd))
      .withColumn("__k", count(lit(1)).over(wAll))
      // equal share of what's left at position i exceeds my capacity
      // (cross-multiplied: exact integers, no division)
      .withColumn("__sat", col("__cap") * (col("__k") - col("__i") + 1L) <
        lit(budgetTokens) - (col("__pfx") - col("__cap")))
    val t2 = t
      .withColumn("__m", sum(when(col("__sat"), 1L).otherwise(0L)).over(wAll))
      .withColumn("__ssum",
        sum(when(col("__sat"), col("__cap")).otherwise(0L)).over(wAll))
    val lam = round((lit(budgetTokens) - col("__ssum")).cast("double") /
      greatest(col("__k") - col("__m"), lit(1L)).cast("double")).cast("long")
    val alloc = when(col("__sat"), col("__cap")).otherwise(lam)
    t2.select(col(groupCol), col("n_tokens"),
      col("__cap").as("capacity_tokens"), col("__sat").as("saturated"),
      alloc.as("alloc_tokens"),
      when(col("n_tokens") > 0, round(alloc.cast("double") /
        col("n_tokens").cast("double"), 6)).as("epochs"),
      round(alloc.cast("double") / lit(budgetTokens.toDouble), 6)
        .as("share"))
  }

  def neymanStratifiedSample(df: DataFrame, keyCol: String,
                             stratumCol: String, valueCol: String,
                             budget: Long,
                             salt: String = "neyman"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, "budget must be >= 1")
    val x = col(valueCol).cast("long")
    // squares widen to DECIMAL(38,0) before the sum (kishEss's
    // discipline) — raw BIGINT x*x overflows silently for large values
    val xd = col(valueCol).cast("decimal(38,0)")
    val stats = df.groupBy(col(stratumCol).as("h"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"),
        sum(xd * xd).as("sxx"))
      .select(col("h"), col("n"),
        (sqrt((col("n").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx").cast("decimal(38,0)"))
          .cast("double")) / col("n")).as("sigma"))
      // loud overflow guard (the Decomposer.scala fold discipline):
      // n·Σx² or (Σx)² past DECIMAL(38,0) nulls SILENTLY under
      // non-ANSI mode, which would zero this stratum's weight and
      // quietly misallocate the whole budget. The bound: per-stratum
      // n·Σx² must stay under 1e38 (e.g. 10¹² rows of |x| ≤ 10¹²
      // is fine; pre-scale valueCol beyond that).
      .select(col("h"), col("n"),
        when(col("sigma").isNull && col("n") > 0,
          raise_error(concat(lit("neymanStratifiedSample: variance " +
            "moments overflowed DECIMAL(38,0) for stratum "),
            col("h").cast("string"),
            lit(" (n*sum(x^2) exceeded 1e38) — pre-scale valueCol"))))
          .otherwise(col("sigma")).as("sigma"))
      .select(col("h"), col("n"), col("sigma"),
        round(col("n").cast("double") * col("sigma") * 1e6).cast("long")
          .as("wh"))
    val statsC = graft.data.ScopedCaches.track(stats)
    val tot = statsC.agg(sum(col("wh")).as("wtot"))
    val alloc = statsC.crossJoin(broadcast(tot))
      .select(col("h"), col("n"), col("sigma"),
        round(lit(budget) * col("wh").cast("double") / col("wtot"))
          .cast("long").as("n_alloc"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat(lit(salt), lit(":"),
        col(keyCol).cast("string"))).asc, col(keyCol).asc)
    val sampled = df
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(alloc.select(col("h").as(stratumCol),
        col("n_alloc"))), Seq(stratumCol))
      .filter(col("__rn") <= col("n_alloc"))
      .groupBy(col(stratumCol).as("h"))
      .agg(count(lit(1)).as("n_sampled"), sum(x).as("ssum"))
    alloc.join(sampled, Seq("h"), "left")
      .select(col("h").as(stratumCol), col("n").as("n_pop"),
        round(col("sigma"), 6).as("sigma"), col("n_alloc"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        when(coalesce(col("n_sampled"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(round(col("ssum").cast("double") /
            col("n_sampled"), 6)).as("sample_mean"))
  }

  /** Kish effective sample size of a weighting scheme:
    * ESS = (Σw)² / Σw² — how many EQUAL-weight samples the weighted
    * corpus is statistically worth. The standard one-number audit of a
    * mixture/quality weighting before training on it: efficiency
    * (= ESS/n) near 1 means the weights are mild; a heavy-tailed
    * weight column collapses ESS toward the few dominant rows.
    *
    * One combinable aggregate; weights taken as integers (cast) so
    * both moment sums are exact (DECIMAL(38,0) for Σw², which
    * overflows BIGINT long before the data stops fitting a cluster);
    * ESS is one fixed-order double division.
    */
  def kishEss(df: DataFrame, weightCol: Column): DataFrame = {
    val agg = df.select(weightCol.cast("long").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("w").cast("decimal(38,0)")).as("sw"),
        // widen BEFORE the multiply — long*long wraps silently; a
        // long² always fits decimal(38,0) (max ≈ 8.5e37)
        sum(col("w").cast("decimal(38,0)") *
          col("w").cast("decimal(38,0)")).as("sww"))
    agg.select(col("n"), col("sw").cast("long").as("sum_w"),
      round(col("sw").cast("double") * col("sw").cast("double") /
        col("sww").cast("double"), 6).as("ess"),
      round(col("sw").cast("double") * col("sw").cast("double") /
        col("sww").cast("double") / col("n").cast("double"), 6)
        .as("efficiency"))
  }
}

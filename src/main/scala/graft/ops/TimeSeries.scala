package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{aggregate => foldAgg, _}

/** Time-series diagnostics over event streams: EWMA smoothing, CUSUM
  * changepoint detection, and autocorrelation. All three collapse the
  * raw stream to a DOMAIN-sized daily series first (one map-side-
  * combinable count per calendar day — bounded by the calendar, not by
  * corpus size), then run the series-level recurrence or correlation on
  * that tiny table. That is the 100 TB shape: the only full-data pass is
  * a count aggregate; the sequential part touches ≤ a few hundred rows
  * regardless of scale. The recurrences (EWMA, CUSUM) are exact left
  * folds expressed with Spark's `aggregate` higher-order function over
  * the sorted series — fully codegen'd, no driver collect, no UDF — and
  * replay bit-for-bit in any engine (the oracles use recursive CTEs).
  */
object TimeSeries {

  /** Daily count series for `tsCol`: (`day`, `x` = count as double). */
  def dailySeries(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))

  /** One-row DataFrame holding the day-sorted series as an array column
    * `s` of struct(day, x). Sorting a struct array orders by the first
    * field (`day`, unique), so the fold order is total and deterministic.
    */
  private def sortedSeries(daily: DataFrame): DataFrame =
    daily.agg(sort_array(collect_list(struct(col("day"), col("x")))).as("s"))

  /** Exponentially-weighted moving average of the daily event count:
    * s_1 = x_1, s_t = s_{t-1} + alpha * (x_t - s_{t-1}) — the update
    * form with a SINGLE alpha literal, deliberately avoiding `1 - alpha`
    * (computing 1−α in binary can land half-an-ulp from the literal the
    * oracle parses, and a recurrence amplifies that seed). The fold runs
    * over the domain-sized series inside one `aggregate` HOF; the oracle
    * replays it with a recursive CTE and matches bit-for-bit before the
    * 6dp output rounding.
    */
  def ewmaDaily(df: DataFrame, tsCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val init = expr("CAST(array() AS array<struct<day:date,x:double,ewma:double>>)")
    val folded = sortedSeries(dailySeries(df, tsCol)).select(
      foldAgg(col("s"), init, (acc: Column, e: Column) =>
        concat(acc, array(struct(
          e.getField("day").as("day"),
          e.getField("x").as("x"),
          when(size(acc) === 0, e.getField("x"))
            .otherwise(element_at(acc, -1).getField("ewma") +
              lit(alpha) * (e.getField("x") -
                element_at(acc, -1).getField("ewma"))).as("ewma")))))
        .as("f"))
    folded.select(explode(col("f")).as("e"))
      .select(col("e.day").as("day"), col("e.x").as("x"),
        round(col("e.ewma"), 6).as("ewma"))
  }

  /** Two-sided CUSUM changepoint detection on the daily count series
    * (Page 1954): with mu/sigma the series mean and sample stddev,
    * slack k = kSigmas*sigma and threshold h = hSigmas*sigma,
    *   sp_t = max(0, sp_{t-1} + (x_t - mu - k))   (upward drift)
    *   sn_t = min(0, sn_{t-1} + (x_t - mu + k))   (downward drift)
    * flagging days where |cusum| exceeds h. mu, k, h are rounded to 6dp
    * BEFORE the fold so the recurrence inputs — and therefore every
    * intermediate — are bit-identical across engines; flags compare the
    * 6dp-rounded statistics so no verdict can sit on an ulp.
    *
    * Emits every day (not only flagged ones) with x, sp, sn, flag — the
    * full trace is what a drift dashboard plots.
    */
  def cusumChangepoint(df: DataFrame, tsCol: String, kSigmas: Double,
                       hSigmas: Double): DataFrame = {
    val daily = dailySeries(df, tsCol)
    val stats = daily.agg(round(avg(col("x")), 6).as("__mu"),
      round(stddev_samp(col("x")), 6).as("__sigma"))
      .select(col("__mu"),
        round(col("__sigma") * kSigmas, 6).as("__k"),
        round(col("__sigma") * hSigmas, 6).as("__h"))
    val init = expr("CAST(array() AS array<struct<day:date,x:double,sp:double,sn:double>>)")
    val folded = sortedSeries(daily).crossJoin(broadcast(stats)).select(
      col("__h"),
      foldAgg(col("s"), init, (acc: Column, e: Column) => {
        val prevSp = when(size(acc) === 0, lit(0d))
          .otherwise(element_at(acc, -1).getField("sp"))
        val prevSn = when(size(acc) === 0, lit(0d))
          .otherwise(element_at(acc, -1).getField("sn"))
        concat(acc, array(struct(
          e.getField("day").as("day"),
          e.getField("x").as("x"),
          greatest(lit(0d),
            prevSp + (e.getField("x") - col("__mu") - col("__k"))).as("sp"),
          least(lit(0d),
            prevSn + (e.getField("x") - col("__mu") + col("__k"))).as("sn"))))
      }).as("f"))
    folded.select(col("__h"), explode(col("f")).as("e"))
      .select(col("e.day").as("day"), col("e.x").as("x"),
        round(col("e.sp"), 6).as("sp"), round(col("e.sn"), 6).as("sn"),
        (round(col("e.sp"), 6) > col("__h") ||
          round(col("e.sn"), 6) < -col("__h")).as("flag"))
  }

  /** Kalman local-level filter over the daily count series: state
    * l_t ~ l_{t-1} + N(0, q), observation x_t ~ l_t + N(0, r). Per
    * day: predicted variance p⁻ = p + q, gain K = p⁻/(p⁻+r), level
    * l += K·(x − l), p = (1−K)·p⁻. The principled middle ground
    * between [[ewmaDaily]] (fixed gain forever) and [[holtDaily]]
    * (trend state): the gain ADAPTS — high while uncertainty is high
    * after initialization, converging to the steady-state set by the
    * q/r signal-to-noise ratio — and the filtered variance `p_var` is
    * an honest uncertainty readout no smoother exposes. Init: l₁ = x₁,
    * p₁ = r, K₁ ≡ 1 (diffuse-ish: trust the first observation).
    *
    * Determinism: ewmaDaily's contract — the fold runs inside one
    * `aggregate` HOF over the day-sorted domain-sized series in a
    * fixed operation order; the oracle replays it with a recursive CTE
    * performing the IDENTICAL double ops (q, r enter as the same
    * parsed literals; 1−K is computed, not parsed, on both sides), so
    * agreement is bitwise before the 6dp output rounding. Corpus-sized
    * work is the daily count; the recursion is calendar-sized.
    */
  def kalmanLocalLevel(df: DataFrame, tsCol: String, q: Double,
                       r: Double): DataFrame = {
    require(q > 0 && r > 0, s"need q, r > 0; got q=$q r=$r")
    val init = expr(
      "CAST(array() AS array<struct<day:date,x:double,l:double,p:double,kg:double>>)")
    val folded = sortedSeries(dailySeries(df, tsCol)).select(
      foldAgg(col("s"), init, (acc: Column, e: Column) => {
        val isFirst = size(acc) === 0
        val lp = element_at(acc, -1).getField("l")
        val pp = element_at(acc, -1).getField("p") + lit(q)
        val kg = pp / (pp + lit(r))
        concat(acc, array(struct(
          e.getField("day").as("day"),
          e.getField("x").as("x"),
          when(isFirst, e.getField("x"))
            .otherwise(lp + kg * (e.getField("x") - lp)).as("l"),
          when(isFirst, lit(r)).otherwise((lit(1.0) - kg) * pp).as("p"),
          when(isFirst, lit(1.0)).otherwise(kg).as("kg"))))
      }).as("f"))
    folded.select(explode(col("f")).as("e"))
      .select(col("e.day").as("day"), col("e.x").as("x"),
        round(col("e.l"), 6).as("level"),
        round(col("e.p"), 6).as("p_var"),
        round(col("e.kg"), 6).as("gain"))
  }

  /** Before/after impact report (Welch's unequal-variance t): per
    * group, the mean/variance of `valCol` strictly before vs at/after
    * `pivot`, and t = (m_a − m_b) / sqrt(s_b²/n_b + s_a²/n_a) — the
    * quantify step after [[cusumChangepoint]] detects WHERE something
    * changed. Groups missing a side, or with a singleton side (no
    * sample variance), emit null t. |t| ≳ 2 is the usual "real shift"
    * reading at these n.
    *
    * Scale shape: one conditional-aggregation pass (two sides per
    * group in the same combinable aggregate — no second scan, no join);
    * output is group-domain-sized.
    */
  def impactWelch(df: DataFrame, groupCol: String, tsCol: String,
                  valCol: String, pivot: String): DataFrame = {
    val before = col(tsCol) < lit(pivot).cast("timestamp")
    def side(cond: Column, suffix: String): Seq[Column] = Seq(
      count(when(cond, 1)).as(s"n_$suffix"),
      avg(when(cond, col(valCol))).as(s"mean_$suffix"),
      var_samp(when(cond, col(valCol))).as(s"var_$suffix"))
    val aggs = side(before, "before") ++ side(!before, "after")
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("n_before"), col("n_after"),
        round(col("mean_before"), 6).as("mean_before"),
        round(col("mean_after"), 6).as("mean_after"),
        round(when(col("n_before") >= 2 && col("n_after") >= 2,
          (col("mean_after") - col("mean_before")) /
            sqrt(col("var_before") / col("n_before") +
              col("var_after") / col("n_after"))), 6).as("t_welch"))
  }

  /** Day-of-week seasonality with a chi-square uniformity statistic:
    * events bucketed by `epoch_day mod 7` (0 = Thursday — integer
    * arithmetic on epoch days, deliberately NOT the engine-specific
    * `dayofweek()` whose origin differs between engines), one row per
    * weekday with its count, expected count under uniformity (N/7), the
    * chi-square contribution (o−e)²/e, and the total statistic repeated
    * per row. Large chi2 = real weekly cycle (or a partial final week —
    * the doc-level caveat of the plain uniformity test).
    *
    * Scale shape: one map-side-combinable count into 7 cells; the
    * statistic is arithmetic over the 7-row domain.
    */
  def dowSeasonality(df: DataFrame, tsCol: String): DataFrame = {
    val dow = pmod(datediff(to_date(col(tsCol)), lit("1970-01-01")), lit(7))
    val counts = df.groupBy(dow.as("dow"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val tot = counts.agg((sum(col("cnt")) / 7d).as("__e"))
    val contrib = counts.crossJoin(broadcast(tot))
      .select(col("dow"), col("cnt"),
        round(col("__e"), 6).as("expected"),
        ((col("cnt") - col("__e")) * (col("cnt") - col("__e")) / col("__e"))
          .as("__c"))
    val chi2 = contrib.agg(sum(col("__c")).as("__chi2"))
    contrib.crossJoin(broadcast(chi2))
      .select(col("dow"), col("cnt"), col("expected"),
        round(col("__c"), 6).as("contrib"),
        round(col("__chi2"), 6).as("chi2"))
  }

  /** Autocorrelation of the daily count series at lags 1..maxLag:
    * r_k = sum_t (x_t - mu)(x_{t+k} - mu) / sum_t (x_t - mu)^2, the
    * standard biased ACF estimator. The mean of integer counts is exact
    * in double (integer sum is exact), so both engines see identical
    * deviations; only the final r_k (in [-1, 1]) is rounded. The lag
    * pairing is a self-join of the domain-sized series on row offset —
    * no window over the raw stream.
    */
  def autocorrDaily(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val daily = dailySeries(df, tsCol)
    val mu = daily.agg(avg(col("x")).as("__mu"))
    // rn via a domain-sized sorted-array explode — same total order as
    // the folds above, no single-partition window over anything big.
    val rn = sortedSeries(daily)
      .select(posexplode(col("s")).as(Seq("rn", "e")))
      .select(col("rn"), col("e.x").as("x"))
      .crossJoin(broadcast(mu))
      .select(col("rn"), (col("x") - col("__mu")).as("dev"))
    val denom = rn.agg(sum(col("dev") * col("dev")).as("__den"))
    val a = rn.select(col("rn").as("rn_a"), col("dev").as("dev_a"))
    val b = rn.select(col("rn").as("rn_b"), col("dev").as("dev_b"))
    a.join(b, col("rn_b") - col("rn_a") >= 1 &&
        col("rn_b") - col("rn_a") <= maxLag)
      .groupBy((col("rn_b") - col("rn_a")).as("lag"))
      .agg(sum(col("dev_a") * col("dev_b")).as("__num"))
      .crossJoin(broadcast(denom))
      .select(col("lag"),
        round(when(col("__den") === 0d, lit(null))
          .otherwise(col("__num") / col("__den")), 6).as("acf"))
  }

  /** Pettitt change-point test on the daily count series — the
    * nonparametric companion to [[cusumChangepoint]]: rank-based, so a
    * single spike day can't fake (or mask) a shift the way it can in
    * the mean/σ-based CUSUM. U_t = Σ_{i≤t,j>t} sgn(x_i − x_j); the
    * change point is the t maximizing |U_t|, with the standard
    * approximate significance p ≈ 2·exp(−6K²/(n³+n²)).
    *
    * Computed via the row-sum recurrence U_t = U_{t−1} + V_t with
    * V_t = Σ_{j≠t} sgn(x_t − x_j), so the pair join is one
    * |days|²-bounded self-join (the corpus itself is touched once, by
    * the daily count). All U_t are exact integers; ties in |U_t| break
    * on the earlier day; only the final p is floating, fixed-order.
    */
  def pettittTest(df: DataFrame, tsCol: String): DataFrame = {
    val daily = graft.data.ScopedCaches.track(
      dailySeries(df, tsCol).select(col("day"), col("x").cast("long").as("x")))
    val a = daily.select(col("day").as("da"), col("x").as("xa"))
    val b = daily.select(col("day").as("db"), col("x").as("xb"))
    val v = a.join(b, col("da") =!= col("db"))
      .groupBy(col("da").as("day"))
      .agg(sum(signum((col("xa") - col("xb")).cast("double"))
        .cast("long")).as("v"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = v.withColumn("u", sum(col("v")).over(wCum))
    val n = daily.agg(count(lit(1)).as("n"))
    // last day's U is 0 by antisymmetry; argmax over t < n is safe to
    // run over all rows. Ties break on the earlier day.
    val wBest = Window.orderBy(abs(col("u")).desc, col("day").asc)
    u.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(n))
      .select(col("n"), col("day").as("cp_day"), col("u").as("u_at_cp"),
        abs(col("u")).as("k"),
        round(lit(2.0) * exp((lit(-6.0) * abs(col("u")) * abs(col("u")))
          .cast("double") /
          (col("n").cast("double") * col("n") * col("n") +
            col("n").cast("double") * col("n"))), 6).as("p_approx"))
  }

  /** Lead-lag cross-correlation between the daily count series of two
    * event types: Pearson r between x_t and y_{t+lag} for every lag in
    * [−maxLag, maxLag] — "do clicks lead purchases, and by how many
    * days" (the peak's lag is the lead time; lag 0 is plain
    * contemporaneous correlation). Unlike [[autocorrDaily]]'s shared-μ
    * deviations, each lag re-estimates both means over ITS overlap
    * window via the five exact integer moment sums, so a lag never
    * borrows mass from days outside its own alignment.
    *
    * Scale shape: one combinable daily count collapses the corpus to
    * the calendar; the lag join and moment sums run on |days| × lags
    * rows. Determinism: all sums are integers (DECIMAL(38,0) for the
    * products); each r is one fixed-order double expression; zero
    * variance on either side yields null.
    */
  def crossCorrDaily(df: DataFrame, tsCol: String, typeCol: String,
                     typeX: String, typeY: String,
                     maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val daily = df.filter(col(typeCol).isin(typeX, typeY))
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(when(col(typeCol) === typeX, 1L).otherwise(0L)).as("x"),
        sum(when(col(typeCol) === typeY, 1L).otherwise(0L)).as("y"))
    val dailyC = graft.data.ScopedCaches.track(daily)
    val lags = dailyC.sparkSession.range(1)
      .select(explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .select(col("lag").cast("int").as("lag"))
    val a = dailyC.select(col("day").as("da"), col("x"))
    val b = dailyC.select(col("day").as("db"), col("y"))
    val dec = "decimal(38,0)"
    val m = a.crossJoin(broadcast(lags))
      .join(b, col("db") === date_add(col("da"), col("lag")))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"))
    val vx = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = col("n").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("lag"), col("n"),
      when(vx > 0 && vy > 0,
        round((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(vx) * sqrt(vy)), 6)).as("r"))
  }

  /** Holt double-exponential (level + trend) smoothing of the daily
    * count series — the one-step-ahead forecaster EWMA can't be once a
    * series trends (EWMA lags a ramp forever; Holt's trend term closes
    * the gap). Update forms with SINGLE alpha/beta literals (same 1−α
    * ulp rationale as [[ewmaDaily]]):
    *   l_t = (l + b) + alpha · (x_t − (l + b))
    *   b_t = b + beta · (l_t − l − b)
    * initialized l_1 = x_1, b_1 = 0 — the parameter-free init (the
    * common x_2 − x_1 trend seed needs a lookahead and an n ≥ 2 guard;
    * with beta > 0 the trend converges to the same path either way).
    * `forecast` is the one-step-ahead l + b at each day. Same 100 TB
    * shape as the other recurrences: one combinable daily count, exact
    * HOF fold over the calendar-bounded series, recursive-CTE oracle.
    */
  def holtDaily(df: DataFrame, tsCol: String, alpha: Double,
                beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta >= 0 && beta <= 1, s"need 0 <= beta <= 1, got $beta")
    val init = expr(
      "CAST(array() AS array<struct<day:date,x:double,l:double,b:double>>)")
    val folded = sortedSeries(dailySeries(df, tsCol)).select(
      foldAgg(col("s"), init, (acc: Column, e: Column) => {
        val prev = element_at(acc, -1)
        val pred = prev.getField("l") + prev.getField("b")
        val lNew = pred + lit(alpha) * (e.getField("x") - pred)
        concat(acc, array(struct(
          e.getField("day").as("day"),
          e.getField("x").as("x"),
          when(size(acc) === 0, e.getField("x")).otherwise(lNew).as("l"),
          when(size(acc) === 0, lit(0.0))
            .otherwise(prev.getField("b") +
              lit(beta) * (lNew - prev.getField("l") - prev.getField("b")))
            .as("b"))))
      }).as("f"))
    folded.select(explode(col("f")).as("e"))
      .select(col("e.day").as("day"), col("e.x").as("x"),
        round(col("e.l"), 6).as("level"), round(col("e.b"), 6).as("trend"),
        round(col("e.l") + col("e.b"), 6).as("forecast"))
  }

  /** Holt-Winters additive triple-exponential smoothing (level + trend
    * + weekly seasonal, period 7) of the daily count series — the
    * forecaster [[holtDaily]] can't be once the series has a weekly
    * cycle (Holt's trend chases the cycle; the seasonal states absorb
    * it). Single-literal update forms throughout:
    *   f_t = l + b + s_head                      (one-step forecast)
    *   l_t = (l+b) + alpha · (x_t − s_head − (l+b))
    *   b_t = b + beta · (l_t − (l+b))
    *   s_t = s_head + gamma · (x_t − l_t − s_head)
    * Pinned init over the first two weeks (requires n ≥ 14, else
    * empty): l₀ = round6(mean week 1), b₀ = round6((mean week 2 −
    * l₀)/7), s₀ = round6(x_i − l₀) for the first 7 days. The seasonal
    * state is a ROTATING 7-list — each step consumes the head and
    * appends the update — so both engines only ever index position 1
    * (no mod arithmetic to disagree on). Every state is re-pinned to
    * 6dp per step, so the three-way recurrence replays exactly; the
    * oracle is a recursive CTE carrying the same list.
    * Same 100 TB shape as the other recurrences: one combinable daily
    * count, then a calendar-bounded fold.
    */
  def holtWintersDaily(df: DataFrame, tsCol: String, alpha: Double,
                       beta: Double, gamma: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    require(beta >= 0 && beta <= 1, s"need 0 <= beta <= 1, got $beta")
    require(gamma >= 0 && gamma <= 1, s"need 0 <= gamma <= 1, got $gamma")
    val one = sortedSeries(dailySeries(df, tsCol))
      .filter(size(col("s")) >= 14)
    val emptyOut = expr("CAST(array() AS array<struct<" +
      "day:date,x:double,f:double,l:double,b:double,sv:double>>)")
    val withInit = one
      .withColumn("l0", round(foldAgg(slice(col("s"), 1, 7), lit(0d),
        (a: Column, e: Column) => a + e.getField("x")) / 7.0, 6))
      .withColumn("b0", round((foldAgg(slice(col("s"), 8, 7), lit(0d),
        (a: Column, e: Column) => a + e.getField("x")) / 7.0 - col("l0"))
        / 7.0, 6))
      .withColumn("s0", transform(slice(col("s"), 1, 7),
        e => round(e.getField("x") - col("l0"), 6)))
    val folded = withInit.select(
      foldAgg(col("s"),
        struct(col("l0").as("l"), col("b0").as("b"), col("s0").as("sv"),
          emptyOut.as("out")),
        (acc: Column, e: Column) => {
          val sOld = element_at(acc.getField("sv"), 1)
          val pred = acc.getField("l") + acc.getField("b")
          val f = round(pred + sOld, 6)
          val lNew = round(pred +
            lit(alpha) * (e.getField("x") - sOld - pred), 6)
          val bNew = round(acc.getField("b") +
            lit(beta) * (lNew - pred), 6)
          val sNew = round(sOld +
            lit(gamma) * (e.getField("x") - lNew - sOld), 6)
          struct(lNew.as("l"), bNew.as("b"),
            concat(slice(acc.getField("sv"), 2, 6), array(sNew)).as("sv"),
            concat(acc.getField("out"), array(struct(
              e.getField("day").as("day"), e.getField("x").as("x"),
              f.as("f"), lNew.as("l"), bNew.as("b"), sNew.as("sv"))))
              .as("out"))
        }).getField("out").as("o"))
    folded.select(explode(col("o")).as("e"))
      .select(col("e.day").as("day"), col("e.x").as("x"),
        col("e.f").as("forecast"), col("e.l").as("level"),
        col("e.b").as("trend"), col("e.sv").as("seasonal"))
  }

  /** Per-group OLS trend of daily counts: slope/intercept/R² of x(t)
    * over integer epoch days, one group per row — the vectorized
    * complement of [[theilSenTrend]] (that one is robust but its pair
    * join is per-series; this closed form is ONE combinable aggregate
    * for every group at once, the shape that fits "a trend per tenant"
    * at 100 TB). Computed from the moment identities
    * slope = (nΣty − Σt Σy) / (nΣt² − (Σt)²) with the same explicit
    * left-to-right arithmetic in the oracle — never the engine's
    * regr_slope, whose internal form differs. Time is DAYS SINCE THE
    * SERIES START, not raw epoch days: with t ≈ 19700 the denominator
    * nΣt² − (Σt)² cancels eleven digits and hands the slope to shuffle-
    * order ulp noise; centered t keeps every moment small and the 6dp
    * verdicts safely off the rounding boundary. Zero-variance time (a
    * single day) yields nulls. Days with no events for a group count
    * as zero via the same broadcast spine as [[fanoFactor]].
    */
  def olsTrendByGroup(df: DataFrame, groupCol: String,
                      tsCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
    val days = df.select(to_date(col(tsCol)).as("day")).distinct()
    val d0 = days.agg(min(col("day")).as("__d0"))
    val groups = counts.select(col(groupCol)).distinct()
    val cells = groups.crossJoin(broadcast(days))
      .join(counts, Seq(groupCol, "day"), "left")
      .na.fill(0.0, Seq("y"))
      .crossJoin(broadcast(d0))
      .select(col(groupCol),
        datediff(col("day"), col("__d0")).cast("double").as("t"),
        col("y"))
    val m = cells.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("t")).as("st"),
        sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("y") * col("y")).as("syy"))
    val denT = m("n") * m("stt") - m("st") * m("st")
    val denY = m("n") * m("syy") - m("sy") * m("sy")
    val num = m("n") * m("sty") - m("st") * m("sy")
    m.select(col(groupCol), col("n").cast("long").as("n_days"),
      when(denT =!= 0.0, round(num / denT, 6)).as("slope"),
      when(denT =!= 0.0,
        round((m("sy") - num / denT * m("st")) / m("n"), 6))
        .as("intercept"),
      when(denT =!= 0.0 && denY =!= 0.0,
        round(num * num / (denT * denY), 6)).as("r2"))
  }

  /** Theil-Sen robust trend over the daily count series: slope = the
    * exact median of all pairwise slopes (x_j − x_i)/(t_j − t_i),
    * i < j, with t integer epoch days; intercept = median of
    * x_i − slope·t_i with the slope pinned to 6dp first so both medians
    * replay. Breakdown point ~29% — the level-shift days CUSUM flags
    * would drag an OLS fit; the pairwise median shrugs them off.
    *
    * Scale shape: the self-join is over the DOMAIN-sized daily series —
    * pairs grow quadratically in CALENDAR DAYS, not in data (a decade
    * of days is ~6.7M pairs, one task's work); both medians are
    * single-row exact-percentile aggregates.
    */
  /** Fano factor (variance-to-mean ratio of DAILY counts) per group —
    * the burstiness audit: ≈1 is Poisson-like arrivals, ≫1 bursty
    * (incident storms, bots, batch replays), ≪1 metronomic. Days with
    * no events COUNT AS ZERO: the (group × observed-calendar) spine is
    * a broadcast cross-join, absent cells zero-filled — dropping them
    * would bias every sparse group toward its busy days. Mean and
    * variance are 6dp-pinned before the ratio (CUSUM's rule), so the
    * verdict arithmetic replays; singleton calendars have no sample
    * variance — null.
    */
  def fanoFactor(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val days = df.select(to_date(col(tsCol)).as("day")).distinct()
    val groups = counts.select(col(groupCol)).distinct()
    val cells = groups.crossJoin(broadcast(days))
      .join(counts, Seq(groupCol, "day"), "left")
      .na.fill(0.0, Seq("x"))
    cells.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"),
        round(avg(col("x")), 6).as("mean_daily"),
        round(var_samp(col("x")), 6).as("var_daily"))
      .select(col(groupCol), col("n_days"), col("mean_daily"),
        col("var_daily"),
        round(col("var_daily") / col("mean_daily"), 6).as("fano"))
  }

  /** Classical additive seasonal decomposition of the daily count
    * series: x = trend + seasonal + residual, with trend the centered
    * 7-day moving average (defined only where the full window exists),
    * seasonal the mean-centered weekday average of the detrended
    * series, residual the rest. The moving sum `s7` is a window over
    * INTEGER counts (exact in double), and the detrended values enter
    * the weekday means as the exact integers 7·x − s7 — scaled by the
    * window width instead of dividing per row — so every aggregate here
    * sums integers and divides once: bit-stable under partition order,
    * no float-sum ordering anywhere. The weekday grand mean is likewise
    * taken over 6dp-scaled BIGINTs. Weekday = epoch_day mod 7 on both
    * engines (see [[dowSeasonality]] — never engine `dayofweek()`).
    *
    * Scale shape: the only full-data pass is the daily count; windows
    * and joins run on the DOMAIN-sized series (calendar days × 7
    * weekday cells), so the sequential part is a few hundred rows at
    * any corpus size.
    */
  def seasonalDecompose(df: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val win = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val w = daily.select(col("day"), col("c"),
      sum(col("c")).over(win).as("s7"),
      count(lit(1)).over(win).as("n7"),
      (unix_date(col("day")) % 7).as("dow"))
    val t = w.withColumn("trend",
      when(col("n7") === 7, round(col("s7").cast("double") / 7.0, 6)))
    val sr = t.filter(col("n7") === 7)
      .groupBy(col("dow"))
      .agg(round(sum(lit(7L) * col("c") - col("s7")).cast("double") /
        (lit(7.0) * count(lit(1))), 6).as("sraw"))
    val sm = sr.agg((sum(round(col("sraw") * 1e6, 0).cast("long"))
      .cast("double") / (lit(1e6) * count(lit(1)))).as("sm"))
    val se = sr.crossJoin(broadcast(sm))
      .select(col("dow"), round(col("sraw") - col("sm"), 6).as("seasonal"))
    t.join(broadcast(se), Seq("dow"), "left")
      .select(col("day"), col("c").cast("double").as("x"), col("dow"),
        col("trend"), col("seasonal"),
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          round(col("c") - col("trend") - col("seasonal"), 6))
          .as("residual"))
  }

  def theilSenTrend(df: DataFrame, tsCol: String): DataFrame = {
    val d = dailySeries(df, tsCol)
      .select(unix_date(col("day")).cast("double").as("t"), col("x"))
    val a = d.select(col("t").as("t1"), col("x").as("x1"))
    val b = d.select(col("t").as("t2"), col("x").as("x2"))
    val slope = a.join(b, col("t2") > col("t1"))
      .select(((col("x2") - col("x1")) / (col("t2") - col("t1")))
        .as("__sl"))
      .agg(round(percentile(col("__sl"), lit(0.5)), 6).as("slope"),
        count(lit(1)).as("n_pairs"))
    d.crossJoin(broadcast(slope))
      .agg(first(col("slope")).as("slope"),
        first(col("n_pairs")).as("n_pairs"),
        count(lit(1)).as("n_days"),
        round(percentile(col("x") - col("slope") * col("t"), lit(0.5)), 6)
          .as("intercept"))
      .select(col("n_days"), col("n_pairs"), col("slope"), col("intercept"))
  }

  /** Forecast backtest of the two baselines every real model must
    * beat: per group, hold out the last `horizon` days and score (a)
    * the NAIVE forecast (last training-day value, persisted flat) and
    * (b) the SEASONAL-NAIVE walk-forward (each test day predicted by
    * the actual `season` days earlier), with MASE (Hyndman-Koehler
    * 2006) = test MAE of snaive / in-sample one-season MAE — the
    * scale-free "is anything here even forecastable" gauge (MASE ≥ 1
    * means the model adds nothing). Days absent `season` days earlier
    * drop out of both the in-sample denominator and the snaive
    * numerator (inner join on the lagged DATE, never a row lag —
    * calendar gaps must not silently shift the season).
    *
    * Determinism: daily counts are exact integers, so every |error|
    * is an exact integer; each MAE is one int/int divide and MASE one
    * divide of those two doubles, 6dp-pinned. Scale shape: one daily
    * aggregate; the seasonal join is (group, day−season) keyed; the
    * last-train-day value is a max-of-struct per group; everything
    * after runs on the (groups × days) DOMAIN table.
    */
  /** Split-conformal prediction intervals around the seasonal-naive
    * forecaster, per group: residuals |x − x_lag| on a held-out
    * CALIBRATION window (the `calib` days before the test horizon)
    * give the interval half-width as their ⌈(1−α)(n+1)⌉-th order
    * statistic — the distribution-free guarantee (coverage ≥ 1−α on
    * exchangeable data) that [[forecastBacktest]]'s point-error MAE
    * deliberately doesn't claim. The test horizon then reports the
    * interval's EMPIRICAL coverage: a group far below target has
    * non-exchangeable errors (drift, regime change) and its forecast
    * intervals can't be trusted.
    *
    * Determinism: daily counts and residuals are exact integers; the
    * conformal rank k = ⌈(100−alphaPct)(n+1)/100⌉ is pure integer
    * ceiling division (never a float quantile), clamped to n when the
    * calibration window is too small for the target level. Scale
    * shape: one daily aggregate; everything after (lag join, per-group
    * rank over `calib` rows, coverage count) runs on the
    * (groups × days) DOMAIN table.
    */
  def conformalSnaiveIntervals(df: DataFrame, groupCol: String,
                               tsCol: String, horizon: Int, season: Int,
                               calib: Int, alphaPct: Int): DataFrame = {
    require(horizon >= 1 && season >= 1 && calib >= 2,
      "horizon, season >= 1 and calib >= 2")
    require(alphaPct >= 1 && alphaPct <= 50,
      s"alphaPct in [1, 50], got $alphaPct")
    val daily = df.groupBy(col(groupCol).as("g"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val dailyC = graft.data.ScopedCaches.track(daily)
    val bounds = dailyC.agg(date_sub(max(col("day")), horizon).as("tcut"),
      date_sub(max(col("day")), horizon + calib).as("ccut"))
    val withCut = dailyC.crossJoin(broadcast(bounds))
    val lagged = dailyC.select(col("g"),
      date_add(col("day"), season).as("day"), col("x").as("xlag"))
    val cal = withCut.filter(col("day") > col("ccut") &&
        col("day") <= col("tcut"))
      .join(lagged, Seq("g", "day"))
      .select(col("g"), col("day"), abs(col("x") - col("xlag")).as("r"))
    val wr = Window.partitionBy(col("g")).orderBy(col("r"), col("day"))
    val wn = Window.partitionBy(col("g"))
    val q = cal.withColumn("__rk", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("__k", least(col("__n"),
        expr(s"((100 - $alphaPct) * (__n + 1) + 99) div 100")))
      .filter(col("__rk") === col("__k"))
      .select(col("g"), col("__n").as("n_cal"), col("r").as("q_resid"))
    val test = withCut.filter(col("day") > col("tcut"))
      .join(lagged, Seq("g", "day"))
    test.join(broadcast(q), Seq("g"))
      .groupBy(col("g"), col("n_cal"), col("q_resid"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("x") - col("xlag")) <= col("q_resid"), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("g").as(groupCol), col("n_cal"), col("q_resid"),
        col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6)
          .as("coverage"),
        round(lit((100 - alphaPct) / 100.0), 6).as("target"))
  }

  def forecastBacktest(df: DataFrame, groupCol: String, tsCol: String,
                       horizon: Int, season: Int): DataFrame = {
    require(horizon >= 1 && season >= 1, "horizon and season must be >= 1")
    val daily = df.groupBy(col(groupCol).as("g"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val dailyC = graft.data.ScopedCaches.track(daily)
    val cutoff = dailyC.agg(date_sub(max(col("day")), horizon).as("cut"))
    val withCut = dailyC.crossJoin(broadcast(cutoff))
    val train = withCut.filter(col("day") <= col("cut"))
    val test = withCut.filter(col("day") > col("cut"))
    // flat naive: the value on each group's LAST training day
    val lastTrain = train.groupBy(col("g"))
      .agg(max(struct(col("day"), col("x"))).getField("x").as("fnaive"))
    val lagged = dailyC.select(col("g"), date_add(col("day"), season)
      .as("day"), col("x").as("xlag"))
    val snaiveTest = test.join(lagged, Seq("g", "day"))
    val insample = train.join(lagged, Seq("g", "day"))
    val mTest = snaiveTest.join(broadcast(lastTrain), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_test"),
        sum(abs(col("x") - col("fnaive"))).as("saen"),
        sum(abs(col("x") - col("xlag"))).as("saes"))
    val mIn = insample.groupBy(col("g"))
      .agg(count(lit(1)).as("n_in"),
        sum(abs(col("x") - col("xlag"))).as("saei"))
    mTest.join(mIn, "g")
      .select(col("g").as(groupCol), col("n_test"), col("n_in"),
        round(col("saen").cast("double") / col("n_test"), 6)
          .as("mae_naive"),
        round(col("saes").cast("double") / col("n_test"), 6)
          .as("mae_snaive"),
        when(col("saei") === 0, lit(null).cast("double"))
          .otherwise(round((col("saes").cast("double") / col("n_test")) /
            (col("saei").cast("double") / col("n_in")), 6))
          .as("mase_snaive"))
  }

  /** Periodogram of the daily count series — the Fourier power at each
    * candidate frequency k/N, k = 1..⌊N/2⌋, answering "what is the
    * dominant seasonality period" without assuming weekly up front
    * (the spectral generalization of [[dowSeasonality]]). Reports the
    * `topK` frequencies by power with their implied period in days.
    *
    * Exactness recipe: the DFT weights cos/sin(2π·((k·t) mod N)/N) are
    * rounded to 6dp and scaled to ×10⁶ BIGINTs, and the series is
    * mean-centered in scaled integers (y_t = N·x_t − Σx), so each
    * coefficient c_k = Σ y_t·w_t is an EXACT integer sum — immune to
    * summation order, the one thing a distributed engine cannot pin.
    * The only floating steps are the shared weight table (both engines
    * evaluate libm cos on bit-identical arguments; a flip needs the
    * true value within ~1 ulp of a 0.5e-6 rounding boundary) and the
    * final fixed-order power expression I(k) = (ĉ² + ŝ²)/N with
    * ĉ = c/(N·10⁶).
    *
    * Scale shape: one map-side-combinable daily count collapses the
    * corpus to the calendar; the k×t weight grid is |days|²/2 rows —
    * bounded by the calendar squared, independent of corpus size.
    */
  def periodogram(df: DataFrame, tsCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val daily = dailySeries(df, tsCol)
    val idx = sortedSeries(daily)
      .select(posexplode(col("s")).as(Seq("t", "e")))
      .select(col("t").cast("long").as("t"),
        col("e.x").cast("long").as("x"))
    val idxC = graft.data.ScopedCaches.track(idx)
    val tot = idxC.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val ks = tot.select(col("n"), col("sx"),
      explode(sequence(lit(1L), (col("n") / 2L).cast("long"))).as("k"))
    val arg = lit(2.0 * math.Pi) *
      (pmod(col("k") * col("t"), col("n")).cast("double") /
        col("n").cast("double"))
    val coef = idxC.crossJoin(broadcast(ks))
      .select(col("k"), col("n"),
        (col("n") * col("x") - col("sx")).as("y"),
        round(cos(arg) * lit(1000000.0)).cast("long").as("wc"),
        round(sin(arg) * lit(1000000.0)).cast("long").as("ws"))
      .groupBy(col("k"))
      .agg(max(col("n")).as("n"),
        sum(col("y") * col("wc")).as("c"),
        sum(col("y") * col("ws")).as("s"))
    val scale = col("n").cast("double") * lit(1000000.0)
    val power =
      (col("c").cast("double") / scale) * (col("c").cast("double") / scale) +
        (col("s").cast("double") / scale) * (col("s").cast("double") / scale)
    val scored = coef.select(col("k"), col("n"),
      round(col("n").cast("double") / col("k").cast("double"), 6)
        .as("period_days"),
      round(power / col("n").cast("double"), 6).as("power"))
    val w = Window.orderBy(col("power").desc, col("k").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("k"), col("period_days"), col("power"),
        col("rn").cast("long").as("rank"))
  }

  /** Per-(group, day) Poisson burst surprise: the exact KL/Chernoff
    * exponent x·ln(x/λ) − (x − λ) for days where the group's count x
    * exceeds its calendar-wide mean rate λ — the principled "how
    * surprising is this spike" score (the bound P(X ≥ x) ≤ e^{−surprise}
    * holds exactly for Poisson, no gamma-function tail needed), ranked
    * top-`topK`. Complements [[cusumChangepoint]] (which finds level
    * SHIFTS) by scoring individual burst days, per group.
    *
    * λ = group total / calendar days — two combinable integer
    * aggregates; the score is one fixed-order double expression per
    * (group, day) DOMAIN row, ranked on its 6dp rounding (ties → group,
    * day).
    */
  def burstSurprise(df: DataFrame, tsCol: String, groupCol: String,
                    topK: Int = 20): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    val daily = df.groupBy(col(groupCol).as("g"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val dailyC = graft.data.ScopedCaches.track(daily)
    val cal = df.agg((datediff(max(to_date(col(tsCol))),
      min(to_date(col(tsCol)))) + 1).cast("long").as("n_days"))
    val tot = dailyC.groupBy(col("g")).agg(sum(col("x")).as("tx"))
    val lam = col("tx").cast("double") / col("n_days").cast("double")
    val xD = col("x").cast("double")
    val scored = dailyC.join(tot, "g").crossJoin(broadcast(cal))
      .select(col("g"), col("day"), col("x"),
        round(lam, 6).as("lambda"),
        when(xD > lam,
          round(xD * log(xD / lam) - (xD - lam), 6)).otherwise(lit(0.0))
          .as("surprise"))
    val w = Window.orderBy(col("surprise").desc, col("g").asc,
      col("day").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Hurst exponent of the daily count series via rescaled-range (R/S)
    * analysis over dyadic windows w ∈ {4, 8, 16, 32} (those with ≥ 2
    * full blocks): H ≈ 0.5 for memoryless traffic, H > 0.5 for
    * long-range-dependent load (bursts cluster across days — the
    * capacity-planning regime where naive Poisson sizing fails).
    * Output: one row per window (w, n_blocks, avg R/S) with the
    * fitted log–log OLS slope `hurst` repeated on each row.
    *
    * Exactness recipe, same playbook as [[periodogram]]: per block the
    * deviations are w-scaled integers d_t = w·x_t − Σx, so the
    * cumulative range R and the squared-deviation sum are EXACT
    * integers; each block's R/S is one fixed-order double pinned to a
    * ×10⁹ BIGINT (pinning is boundary-free — both engines round the
    * same double), so the per-window averages are summation-order-
    * free. The OLS slope runs over the ≤ 4 (ln w, ln avgRS) points
    * with each coordinate pinned to ×10⁹ and the moment sums in
    * DECIMAL(38,0) — the only libm calls are those four logs.
    *
    * Scale shape: one daily count collapses the corpus; everything
    * after is calendar-sized.
    */
  def hurstRs(df: DataFrame, tsCol: String): DataFrame = {
    val idx = sortedSeries(dailySeries(df, tsCol))
      .select(posexplode(col("s")).as(Seq("t", "e")))
      .select(col("t").cast("long").as("t"),
        col("e.x").cast("long").as("x"))
    val n = idx.agg(count(lit(1)).as("n"))
    val ws = n.select(col("n"),
        explode(typedLit(Seq(4L, 8L, 16L, 32L))).as("w"))
      .filter(col("w") * 2 <= col("n"))
    val blocks = idx.crossJoin(broadcast(ws))
      .filter(col("t") < col("w") * (col("n") / col("w")).cast("long"))
      .select(col("w"), (col("t") / col("w")).cast("long").as("b"),
        col("t"), col("x"))
    val blocksC = graft.data.ScopedCaches.track(blocks)
    val bSums = blocksC.groupBy(col("w"), col("b"))
      .agg(sum(col("x")).as("sx"))
    val dev = blocksC.join(bSums, Seq("w", "b"))
      .select(col("w"), col("b"), col("t"),
        (col("w") * col("x") - col("sx")).as("dd"))
    val wCum = Window.partitionBy(col("w"), col("b")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dev.withColumn("cy", sum(col("dd")).over(wCum))
    val perBlock = cum.groupBy(col("w"), col("b"))
      .agg((max(col("cy")) - min(col("cy"))).as("rsc"),
        sum(col("dd") * col("dd")).as("ssd"))
    val wD = col("w").cast("double")
    val rsPinned = perBlock.filter(col("ssd") > 0)
      .select(col("w"),
        round(((col("rsc").cast("double") / wD) /
          sqrt(col("ssd").cast("double") / (wD * wD * wD))) *
          lit(1.0e9)).cast("long").as("rsp"))
    val perW = rsPinned.groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rsp")).as("srs"))
    val avgRs = (col("srs").cast("double") / lit(1.0e9)) /
      col("n_blocks").cast("double")
    val pts = perW.select(col("w"), col("n_blocks"),
      round(avgRs, 6).as("avg_rs"),
      round(log(col("w").cast("double")) * lit(1.0e9))
        .cast("decimal(38,0)").as("lx"),
      round(log(avgRs) * lit(1.0e9)).cast("decimal(38,0)").as("ly"))
    val ptsC = graft.data.ScopedCaches.track(pts)
    val dec = "decimal(38,0)"
    val mom = ptsC.agg(count(lit(1)).cast(dec).as("np"),
      sum(col("lx")).as("slx"), sum(col("ly")).as("sly"),
      sum(col("lx") * col("lx")).as("slxx"),
      sum(col("lx") * col("ly")).as("slxy"))
    val denom = col("np") * col("slxx") - col("slx") * col("slx")
    val slope = (col("np") * col("slxy") - col("slx") * col("sly"))
      .cast("double") / denom.cast("double")
    // a single qualifying window (daily series < 16 days) makes the OLS
    // denominator 0 — emit null like the file's other degenerate cases
    // (Granger, Ljung-Box), never NaN/Infinity
    ptsC.select(col("w"), col("n_blocks"), col("avg_rs"))
      .crossJoin(broadcast(mom.select(
        when(col("np") >= 2 && denom =!= 0, round(slope, 6))
          .otherwise(lit(null).cast("double")).as("hurst"))))
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per group:
    * Q = n(n+2)·Σ_{k=1..h} ρ̂_k²/(n−k) over the group's daily counts —
    * is there ANY autocorrelation structure left, the one-number
    * whiteness gate to run before trusting an i.i.d. assumption
    * (Poisson capacity sizing, naive bootstrap CIs) on an event
    * stream. Rejects at α=0.05 against the χ²(h) critical value,
    * pinned as a literal (14.067140 for h=7 — Q is compared, never a
    * p-value integral).
    *
    * Exactness: deviations use the w-scaled integer trick (d_t =
    * n·x_t − Σx, an exact BIGINT), so each lag's Σ d_t·d_{t+k} and the
    * denominator Σ d_t² are exact DECIMAL(38,0) sums — the scale
    * cancels in ρ̂. Each ρ̂_k is pinned to a ×10⁶ integer (one double
    * divide of two exact integers — identical in any engine), each
    * Q-term to a ×10⁹ integer, so the cross-lag sum is order-free and
    * the whole statistic replays exactly in SQL. Each group's series is
    * zero-filled onto the corpus day spine (fanoFactor's pattern), so
    * lag k always spans k calendar days — sparse groups' quiet days are
    * observations, not gaps. The only corpus-sized work is the
    * (group, day) count; everything else runs on the
    * calendar-sized domain. Constant series (zero variance) → null Q,
    * not a zero-divide; groups with ≤ h+1 days are excluded (the
    * statistic needs n−k ≥ 1 at every lag).
    */
  /** Granger-causality screen (Granger 1969) between two event types'
    * daily series, both directions, in the likelihood-ratio form:
    * does adding x_{t−1} to an AR(1) model of y_t reduce the residual
    * sum of squares more than chance — LR = m·ln(RSS_r/RSS_u),
    * asymptotically χ²(1), rejected against the pinned 3.841459
    * critical value. The step after [[crossCorrDaily]] says the series
    * co-move: does the lead PREDICT, incrementally over y's own
    * history. (Predictive precedence, not causation — the standard
    * caveat.)
    *
    * Both OLS fits are closed-form over ten moment sums of the lagged
    * daily series — exact BIGINT/DECIMAL(38,0) integers, since daily
    * counts are integers. The restricted fit uses the simple-regression
    * identities; the unrestricted 3×3 solve uses Cramer determinants in
    * doubles (their 3-moment products overflow DECIMAL(38,0); doubles
    * computed from identical exact integers are identical in any
    * engine, same argument as every ×10⁹ pin). Corpus-sized work is
    * ONE filtered (day) aggregate; every fit runs on calendar-domain
    * moments. Degenerate fits (collinear regressors, zero residual)
    * yield null, never a divide error.
    */
  def grangerLr(df: DataFrame, tsCol: String, typeCol: String,
                typeA: String, typeB: String,
                critValue: Double = 3.841459): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = df.filter(col(typeCol).isin(typeA, typeB))
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("a"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("b"))
    val wd = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    // consecutive-rn lag pairs (autocorrDaily's total order); the
    // window is over the calendar-sized daily table only
    val rn = daily.select(row_number().over(wd).as("rn"),
      col("a"), col("b"))
    val cur = rn.select(col("rn"), col("a"), col("b"))
    val prev = rn.select((col("rn") + 1).as("rn"),
      col("a").as("ap"), col("b").as("bp"))
    val lagged = graft.data.ScopedCaches.track(cur.join(prev, "rn"))
    def fit(xp: String, yp: String, y: String, label: String) = {
      val mom = lagged.agg(
        count(lit(1)).as("m"),
        sum(col(yp)).as("s1"), sum(col(xp)).as("s2"),
        sum(col(y)).as("sy"),
        sum((col(yp) * col(yp)).cast(dec)).as("s11"),
        sum((col(xp) * col(xp)).cast(dec)).as("s22"),
        sum((col(yp) * col(xp)).cast(dec)).as("s12"),
        sum((col(yp) * col(y)).cast(dec)).as("s1y"),
        sum((col(xp) * col(y)).cast(dec)).as("s2y"),
        sum((col(y) * col(y)).cast(dec)).as("syy"))
      def d(c: String) = col(c).cast("double")
      val m = d("m"); val s1 = d("s1"); val s2 = d("s2"); val sy = d("sy")
      val s11 = d("s11"); val s22 = d("s22"); val s12 = d("s12")
      val s1y = d("s1y"); val s2y = d("s2y"); val syy = d("syy")
      val denR = m * s11 - s1 * s1
      val bR = (m * s1y - s1 * sy) / denR
      val aR = (sy - bR * s1) / m
      val rssR = syy - aR * sy - bR * s1y
      val det = m * (s11 * s22 - s12 * s12) -
        s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
      val det0 = sy * (s11 * s22 - s12 * s12) -
        s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
      val det1 = m * (s1y * s22 - s12 * s2y) -
        sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
      val det2 = m * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
      val b0 = det0 / det; val b1 = det1 / det; val b2 = det2 / det
      val rssU = syy - b0 * sy - b1 * s1y - b2 * s2y
      mom.select(lit(label).as("direction"), col("m").as("n_obs"),
        when(col("m") > 3 && denR =!= 0.0 && det =!= 0.0 && rssU > 0.0,
          round(m * log(rssR / rssU), 6)).as("lr_stat"))
    }
    fit("ap", "bp", "b", s"$typeA->$typeB")
      .unionAll(fit("bp", "ap", "a", s"$typeB->$typeA"))
      .withColumn("reject", col("lr_stat") > critValue)
  }

  def ljungBox(df: DataFrame, tsCol: String, grpCol: String,
               maxLag: Int = 7, critValue: Double = 14.067140): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val dec = "decimal(38,0)"
    val obs = df.groupBy(col(grpCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    // zero-fill onto the corpus day spine (fanoFactor's pattern): lag k
    // must span k CALENDAR days — a sparse group's zero-count days are
    // real observations of the documented "daily counts" series, not
    // gaps to compact away
    val days = df.select(to_date(col(tsCol)).as("day")).distinct()
    val groups = obs.select(col("g")).distinct()
    val daily = groups.crossJoin(broadcast(days))
      .join(obs, Seq("g", "day"), "left")
      .na.fill(0L, Seq("x"))
    val st = daily.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .filter(col("n") > maxLag + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("day"))
    val r = graft.data.ScopedCaches.track(
      daily.join(st, "g")
        .select(col("g"), col("n"),
          row_number().over(w).as("rn"),
          (col("n") * col("x") - col("s")).as("dev")))
    val den = r.groupBy("g")
      .agg(sum((col("dev") * col("dev")).cast(dec)).as("den"))
    val a = r.select(col("g"), col("rn").as("rn_a"), col("dev").as("dev_a"))
    val b = r.select(col("g"), col("rn").as("rn_b"), col("dev").as("dev_b"))
    val rho = a.join(b, Seq("g"))
      .filter(col("rn_b") - col("rn_a") >= 1 &&
        col("rn_b") - col("rn_a") <= maxLag)
      .groupBy(col("g"), (col("rn_b") - col("rn_a")).as("k"))
      .agg(sum((col("dev_a") * col("dev_b")).cast(dec)).as("num"))
      .join(den, "g")
      .select(col("g"), col("k"),
        when(col("den") > 0,
          round(lit(1.0e6) * col("num").cast("double") /
            col("den").cast("double")).cast("long")).as("rho6"))
    val q = rho
      .join(st.select(col("g"), col("n")), "g")
      .select(col("g"), col("n"),
        round((col("rho6") * col("rho6")).cast("double") /
          (lit(1.0e3) * (col("n") - col("k")).cast("double")))
          .cast("long").as("t9"))
      .groupBy(col("g"), col("n"))
      .agg(sum(col("t9")).as("s9"), count(col("t9")).as("n_t"))
    q.select(col("g").as(grpCol), col("n").as("n_days"),
        when(col("n_t") === maxLag,
          round((col("n") * (col("n") + 2)).cast("double") *
            (col("s9").cast("double") / lit(1.0e9)), 6)).as("q_stat"))
      .withColumn("lb_reject", col("q_stat") > critValue)
  }
}

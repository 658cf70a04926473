package graft.queries

/** DuckDB oracle SQL for the `d_mine_*` driver-contract queries.
  *
  * The mining stack's output on a fixed small attribute universe is a
  * deterministic function of the subset-entropy lattice (8 subsets for
  * n = 3) plus the reference's measure formulas, clamps, and slacks
  * (`entropy/AbstractDataset.java:94-277`, `common/Measure.java:6`,
  * `search/MinimalJDGenerator.java:213-217` in /root/reference). This
  * generator re-derives those results independently in SQL: an entropy
  * CTE per subset mask, candidate enumeration as VALUES over bitmasks,
  * and the same clamp/threshold arithmetic — so the driver's DuckDB gate
  * can hash-compare the full mining pipeline, not just row counts.
  *
  * All SQL is generated from (n, thresholds) only — no data peeking.
  */
object MiningOracles {

  /** Attribute universe of the mining queries (must match
    * [[MiningQueries]]): attr i = cols(i) of the lineitem projection.
    */
  val table = "lineitem"
  val cols: Seq[String] = Seq("l_returnflag", "l_linestatus", "l_quantity")
  private val n = cols.length
  private val fullMask = (1 << n) - 1

  private def colsOf(mask: Int): Seq[String] =
    (0 until n).filter(i => (mask & (1 << i)) != 0).map(cols)

  private def setString(mask: Int): String =
    (0 until n).filter(i => (mask & (1 << i)) != 0).mkString("{", ", ", "}")

  /** `WITH` prelude: raw count, per-mask entropies (reference semantics:
    * H(empty)=0, H(full)=log2 N, else log2 N - sum(c log2 c)/N), and the
    * mask -> "{i, j}" rendering table.
    */
  private def prelude: String = {
    val ents = (1 until fullMask).map { m =>
      s"""  UNION ALL SELECT $m, log2(n) - (SELECT sum(c*log2(c)) FROM
         |    (SELECT CAST(count(*) AS DOUBLE) AS c FROM $table GROUP BY ${colsOf(m).mkString(", ")}) g)/n FROM nn""".stripMargin
    }.mkString("\n")
    val fmt = (0 to fullMask).map(m => s"($m, '${setString(m)}')").mkString(", ")
    s"""WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM $table),
       |h AS (
       |  SELECT 0 AS mask, 0.0 AS ent FROM nn
       |  UNION ALL SELECT $fullMask, log2(n) FROM nn
       |$ents
       |),
       |fmt(mask, s) AS (VALUES $fmt)""".stripMargin
  }

  /** Scalar entropy lookup for a mask-valued SQL expression. */
  private def hv(maskExpr: String): String =
    s"(SELECT ent FROM h WHERE mask = ($maskExpr))"

  /** The reference's +-1e-7 zero clamp (`AbstractDataset.java:224-226`). */
  private def clamp(x: String): String =
    s"(CASE WHEN abs($x) < 1e-7 THEN 0.0 ELSE $x END)"

  /** Minimal approximate FDs X -> a, measure H(Xa) - H(X) (clamped),
    * kept when measure - t <= 1e-5, minimized by subset anti-join.
    */
  def fdSql(threshold: Double): String = {
    val cand = (for {
      a <- 0 until n
      lhs <- 0 to fullMask if (lhs & (1 << a)) == 0
    } yield s"($lhs, $a)").mkString(", ")
    s"""$prelude,
       |cand(lhsmask, rhsbit) AS (VALUES $cand),
       |meas AS (
       |  SELECT lhsmask, rhsbit,
       |    ${hv("lhsmask | (1 << rhsbit)")} - ${hv("lhsmask")} AS m0
       |  FROM cand),
       |cl AS (SELECT lhsmask, rhsbit, ${clamp("m0")} AS m FROM meas),
       |holding AS (SELECT * FROM cl WHERE m - $threshold <= 1e-5),
       |minimal AS (
       |  SELECT * FROM holding t WHERE NOT EXISTS (
       |    SELECT 1 FROM holding u
       |    WHERE u.rhsbit = t.rhsbit AND (u.lhsmask & t.lhsmask) = u.lhsmask
       |      AND u.lhsmask <> t.lhsmask))
       |SELECT fl.s AS lhs, fr.s AS rhs, round(m, 6) AS measure
       |FROM minimal
       |JOIN fmt fl ON fl.mask = minimal.lhsmask
       |JOIN fmt fr ON fr.mask = (1 << minimal.rhsbit)""".stripMargin
  }

  /** Canonical MVD candidates (X, Y): Y a nonempty proper partition half
    * of R-X containing min(R-X) — mirrors `MvdMiner.candidatesFor`.
    */
  private def mvdCandidates: Seq[(Int, Int)] =
    for {
      x <- 0 to fullMask
      rest = fullMask & ~x
      if Integer.bitCount(rest) >= 2
      anchor = Integer.numberOfTrailingZeros(rest)
      others = (0 until n).filter(i => i != anchor && (rest & (1 << i)) != 0)
      ymask <- (0 until (1 << others.length)).map { sel =>
        others.zipWithIndex.foldLeft(1 << anchor) { case (m, (attr, j)) =>
          if ((sel & (1 << j)) != 0) m | (1 << attr) else m
        }
      }
      if ymask != rest
    } yield (x, ymask)

  /** All approximate MVDs X ->> Y among canonical candidates, measure
    * H(XY) + H(R-Y) - H(R) - H(X) (clamped), kept when <= t + 1e-5.
    */
  def mvdSql(threshold: Double): String = {
    val cand = mvdCandidates.map { case (x, y) => s"($x, $y)" }.mkString(", ")
    s"""$prelude,
       |cand(xmask, ymask) AS (VALUES $cand),
       |meas AS (
       |  SELECT xmask, ymask,
       |    ${hv("xmask | ymask")} + ${hv(s"$fullMask - ymask")}
       |      - ${hv(s"$fullMask")} - ${hv("xmask")} AS m0
       |  FROM cand),
       |cl AS (SELECT xmask, ymask, ${clamp("m0")} AS m FROM meas)
       |SELECT fx.s AS lhs, fy.s AS rhs
       |FROM cl
       |JOIN fmt fx ON fx.mask = cl.xmask
       |JOIN fmt fy ON fy.mask = cl.ymask
       |WHERE m - $threshold <= 1e-5""".stripMargin
  }

  // ---- n = 3 JD search control flow, re-derived in SQL ----
  //
  // For three attributes the JD miner's state space is tiny and its
  // outcome is a deterministic function of the entropy lattice:
  //
  //  * consistentJd({c}, a, b) exists iff I(a;b|c) <= eps + 1e-5
  //    (the only merge would join a and b; the JD measure equals the
  //    same clamped quantity, so validity follows).
  //  * consistentJd(empty, a, b): merge-to-consistency from
  //    [{0},{1},{2}] sweeps pairs in order (0,1),(0,2),(1,2), restarting
  //    after each merge; at most two merges are possible before
  //    everything collapses. Encoded below as a CASE over the three
  //    pairwise I(i;j) values and the second-round merge tests.
  //  * minimalSeparators(a, b) = {} -> [empty] if consistentJd(empty)
  //    exists (reached by minimizing the elemental seed {c}), else
  //    [{c}] if consistentJd({c}) exists, else none.

  private val eps = 1.0
  private def mask(is: Int*): Int = is.foldLeft(0)((m, i) => m | (1 << i))

  /** I(x ; y | empty) over singleton/merged component masks. */
  private def iPair(x: Int, y: Int): String =
    clamp(s"${hv(x.toString)} + ${hv(y.toString)} - ${hv((x | y).toString)}")

  /** I(a ; b | c) — the pairwise merge test under separator {c}. */
  private def iCond(a: Int, b: Int, c: Int): String =
    clamp(s"${hv(mask(c, a).toString)} + ${hv(mask(c, b).toString)} " +
      s"- ${hv(fullMask.toString)} - ${hv(mask(c).toString)}")

  /** JD measure of a 2-component JD with empty lhs: clamp(max(H(X)+H(Y)-H(R), 0)). */
  private def m2(x: Int, y: Int): String =
    clamp(s"greatest(${hv(x.toString)} + ${hv(y.toString)} - ${hv(fullMask.toString)}, 0.0)")

  /** JD measure of the all-singletons JD with empty lhs. */
  private def m3: String =
    clamp(s"greatest(${hv("1")} + ${hv("2")} + ${hv("4")} - ${hv(fullMask.toString)}, 0.0)")

  private def mustMerge(i: String): String = s"($i - $eps > 1e-5)"

  /** Does the 2-component partition given by (xmask, ymask) separate
    * attributes a and b?
    */
  private def separates(x: Int, y: Int, a: Int, b: Int): Boolean = {
    val inX = (i: Int) => (x & (1 << i)) != 0
    inX(a) != inX(b)
  }

  /** SQL boolean: consistentJd(empty, a, b) exists. */
  private def emptyOk(a: Int, b: Int): String = {
    // merge outcomes, in sweep order: (0,1) -> [{0,1},{2}], etc.
    val branches = Seq((0, 1, 2), (0, 2, 1), (1, 2, 0)).map { case (i, j, k) =>
      val merged = mask(i, j); val rest = mask(k)
      val sep = separates(merged, rest, a, b)
      val cond = mustMerge(iPair(1 << i, 1 << j))
      val stable = s"NOT ${mustMerge(iPair(merged, rest))}"
      // 2-component validity is implied by the failed merge test
      // (measure = max(I,0) <= eps + slack), so only separation gates
      s"WHEN $cond THEN ${if (sep) stable else "FALSE"}"
    }.mkString("\n       ")
    s"""(CASE $branches
       |       ELSE $m3 - ${2 * eps} <= 1e-5 END)""".stripMargin
  }

  /** SQL boolean: consistentJd({c}, a, b) exists (elemental seed). */
  private def cOk(a: Int, b: Int, c: Int): String =
    s"(${iCond(a, b, c)} - $eps <= 1e-5)"

  /** Minimal separators per attribute pair (a, b): `{}` when the empty
    * separator admits a consistent JD, else `{c}`, else no row — the
    * n = 3 collapse of the transversal fixpoint.
    */
  def minsepsSql: String = {
    val pairs = for {
      a <- 0 until n; b <- a + 1 until n
      c = (0 until n).find(i => i != a && i != b).get
    } yield
      s"""SELECT '$a' AS a, '$b' AS b,
         |  CASE WHEN ${emptyOk(a, b)} THEN '{}' ELSE '${setString(1 << c)}' END AS separator
         |FROM nn WHERE ${cOk(a, b, c)}""".stripMargin
    s"$prelude\n${pairs.mkString("\nUNION ALL\n")}"
  }

  /** All JDs mined by `mineAllFullJds` (n = 3): per pair (a, b) with
    * mined separator `{c}` the JD {{c}|{a},{b}}; per pair with mined
    * separator `{}` the DFS over merges from [{0},{1},{2}] — the
    * all-singleton JD (if within 2*eps) plus the two mergers that keep
    * a and b apart (each within eps). Deduplicated across pairs.
    */
  def jdsSql: String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    // {c}-separator JDs
    for {
      a <- 0 until n; b <- a + 1 until n
      c = (0 until n).find(i => i != a && i != b).get
    } {
      val meas = clamp(s"greatest(${hv(mask(c, a).toString)} + ${hv(mask(c, b).toString)} " +
        s"- ${hv(mask(c).toString)} - ${hv(fullMask.toString)}, 0.0)")
      parts += s"""SELECT '${setString(1 << c)}' AS separator,
                  |  '${setString(1 << a)},${setString(1 << b)}' AS components,
                  |  round($meas, 6) AS measure
                  |FROM nn WHERE ${cOk(a, b, c)} AND NOT ${emptyOk(a, b)}""".stripMargin
    }
    // empty-separator JDs: reachable iff SOME pair mined the empty sep
    val anyEmpty = (for {
      a <- 0 until n; b <- a + 1 until n
      c = (0 until n).find(i => i != a && i != b).get
    } yield s"(${cOk(a, b, c)} AND ${emptyOk(a, b)})").mkString(" OR ")
    parts += s"""SELECT '{}' AS separator, '{0},{1},{2}' AS components,
                |  round($m3, 6) AS measure
                |FROM nn WHERE ($anyEmpty) AND $m3 - ${2 * eps} <= 1e-5""".stripMargin
    // two-component mergers [{z},{x,y}]: reachable from pair (z,x) or
    // (z,y) when that pair mined the empty separator
    for (z <- 0 until n) {
      val Seq(x, y) = (0 until n).filterNot(_ == z)
      val reach = Seq((math.min(z, x), math.max(z, x)), (math.min(z, y), math.max(z, y)))
        .map { case (a, b) =>
          val c = (0 until n).find(i => i != a && i != b).get
          s"(${cOk(a, b, c)} AND ${emptyOk(a, b)})"
        }.mkString(" OR ")
      val meas = m2(1 << z, mask(x, y))
      parts += s"""SELECT '{}' AS separator,
                  |  '${setString(1 << z)},${setString(mask(x, y))}' AS components,
                  |  round($meas, 6) AS measure
                  |FROM nn WHERE ($reach) AND $meas - $eps <= 1e-5""".stripMargin
    }
    s"$prelude\n${parts.mkString("\nUNION ALL\n")}"
  }
}

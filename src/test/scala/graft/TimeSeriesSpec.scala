package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  import SparkSuite._

  /** One event per (day, repeat) — lets a test spell a daily-count
    * series directly: counts(i) events on day 2024-01-(i+1).
    */
  private def seriesDf(counts: Seq[Int]): DataFrame = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"))
    }.toDF("ts")
  }

  test("periodogram: a planted period-4 cycle dominates; flat series is powerless") {
    // x = 10 + 5*cos(2*pi*t/4): period 4 over 16 days -> k = N/4 = 4
    val cyc = Seq.tabulate(16)(t =>
      10 + math.round(5 * math.cos(2 * math.Pi * t / 4)).toInt)
    val top = TimeSeries.periodogram(seriesDf(cyc), "ts", topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(top.head._1 == 4L && top.head._2 == 4.0,
      s"dominant frequency should be k=4 (period 4), got ${top.head}")
    // all remaining spectral mass is zero for an exact sinusoid on-grid
    assert(top.tail.forall(_._3 == 0.0), s"leakage: ${top.toSeq}")
    // constant series: every coefficient exactly 0 after centering
    val flat = TimeSeries.periodogram(seriesDf(Seq.fill(12)(7)), "ts", 3)
      .collect().map(_.getDouble(2))
    assert(flat.forall(_ == 0.0))
  }

  test("hurstRs: exact-alternation blocks give R/S = 1 and slope 0; constants vanish") {
    // x alternates 5,15: every w-block has mean 10, cum-dev range R = 5,
    // population sigma = 5 -> R/S exactly 1 at every window -> slope 0
    val alt = Seq.tabulate(16)(t => if (t % 2 == 0) 5 else 15)
    val got = TimeSeries.hurstRs(seriesDf(alt), "ts")
      .orderBy("w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2)).toSeq == Seq((4L, 4L), (8L, 2L)))
    assert(got.forall(g => g._3 == 1.0 && g._4 == 0.0), got.toSeq.toString)
    // constant series: every block has zero variance -> no usable
    // blocks at any window -> empty profile, not a divide-by-zero
    assert(TimeSeries.hurstRs(seriesDf(Seq.fill(16)(9)), "ts").count() == 0L)
  }

  test("burstSurprise: a planted spike day tops the ranking with the exact KL score") {
    import spark.implicits._
    // type A: 2,2,2,14 over 4 days (lambda = 5); type B: flat 3s
    val rows =
      Seq(2, 2, 2, 14).zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(("A", java.sql.Timestamp.valueOf(
          f"2024-01-${i + 1}%02d 12:00:00")))
      } ++
      Seq.fill(4 * 3)(0).zipWithIndex.map { case (_, j) =>
        ("B", java.sql.Timestamp.valueOf(
          f"2024-01-${j % 4 + 1}%02d 12:00:00"))
      }
    val df = rows.toDF("event_type", "ts")
    val got = TimeSeries.burstSurprise(df, "ts", "event_type", topK = 3)
      .orderBy("rank").collect()
    val top = got.head
    // surprise = 14*ln(14/5) - 9, rounded 6dp
    val want = BigDecimal(14.0 * math.log(14.0 / 5.0) - 9.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getString(0) == "A" && top.getLong(2) == 14L)
    assert(top.getDouble(4) == want, s"got ${top.getDouble(4)} want $want")
    // flat type B never scores above 0
    assert(got.filter(_.getString(0) == "B").forall(_.getDouble(4) == 0.0))
  }

  test("ewmaDaily matches the hand-rolled recurrence") {
    val counts = Seq(10, 20, 10, 40)
    val got = TimeSeries.ewmaDaily(seriesDf(counts), "ts", alpha = 0.5)
      .orderBy("day").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // s1=10; s2=10+0.5*(20-10)=15; s3=15+0.5*(10-15)=12.5; s4=12.5+0.5*27.5=26.25
    assert(got.toSeq == Seq((10d, 10d), (20d, 15d), (10d, 12.5), (40d, 26.25)))
  }

  test("crossCorrDaily: a planted one-day lead peaks exactly at lag 1") {
    import spark.implicits._
    // clicks count i on day i (1..5); purchases = previous day's clicks
    // on days 2..6 -> y_{t+1} == x_t exactly: r(lag=1) = 1
    val clicks = (1 to 5).flatMap(i => Seq.fill(i)(
      (java.sql.Timestamp.valueOf(f"2024-01-0$i 10:00:00"), "click")))
    val buys = (1 to 5).flatMap(i => Seq.fill(i)(
      (java.sql.Timestamp.valueOf(f"2024-01-0${i + 1} 10:00:00"),
        "purchase")))
    val df = (clicks ++ buys).toDF("ts", "event_type")
    val got = TimeSeries.crossCorrDaily(df, "ts", "event_type",
        "click", "purchase", maxLag = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got(1) == ((5L, Some(1.0))))
    // daily spine covers days 1..6 (x=0 on day 6, y=0 on day 1), so
    // lag -1 pairs days 2..6 against 1..5: misaligned ramps, r < 1
    assert(got(-1)._1 == 5L && got(-1)._2.exists(_ < 1.0))
    assert(got.keySet == (-2 to 2).toSet)
  }

  test("pettittTest: planted level shift, U peaks at the boundary day") {
    // 4 days at 10 then 4 days at 30: V = -4 per low day, +4 per high
    // day -> U = (-4,-8,-12,-16,-12,-8,-4,0), K = 16 at day 4
    val counts = Seq(10, 10, 10, 10, 30, 30, 30, 30)
    val r = TimeSeries.pettittTest(seriesDf(counts), "ts").collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDate(1).toString == "2024-01-04")
    assert(r.getLong(2) == -16L && r.getLong(3) == 16L)
    val p = BigDecimal(2.0 * math.exp(-6.0 * 16 * 16 /
        (8.0 * 8 * 8 + 8.0 * 8)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == p)
  }

  test("cusumChangepoint flags a planted level shift and resets at zero") {
    // 8 calm days at 10, then 4 days at 30: mu ~ 16.67, a clear upward
    // drift the positive CUSUM accumulates; the calm prefix stays clamped
    // at 0 (sp never goes negative, sn bounded above by 0).
    val counts = Seq(10, 10, 10, 10, 10, 10, 10, 10, 30, 30, 30, 30)
    val rows = TimeSeries.cusumChangepoint(seriesDf(counts), "ts",
      kSigmas = 0.5, hSigmas = 2.0).orderBy("day").collect()
    val sp = rows.map(_.getDouble(2))
    val sn = rows.map(_.getDouble(3))
    val flags = rows.map(_.getBoolean(4))
    assert(sp.forall(_ >= 0) && sn.forall(_ <= 0))
    assert(sp.take(8).forall(_ == 0d), "calm prefix must stay clamped")
    assert(sp.drop(8).zip(sp.drop(9)).forall { case (a, b) => b > a },
      "shifted suffix must accumulate")
    assert(!flags.take(8).exists(identity) && flags.last,
      "flag only after the shift accumulates past h")
  }

  test("autocorrDaily: alternating series has acf(1) < 0 < acf(2)") {
    val counts = Seq(10, 30, 10, 30, 10, 30, 10, 30)
    val got = TimeSeries.autocorrDaily(seriesDf(counts), "ts", maxLag = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // exact: mean 20, dev = ±10; lag1 pairs all opposite-sign (7 of
    // them), lag2 all same-sign (6): r1 = -700/800, r2 = 600/800
    assert(got(1) == -0.875 && got(2) == 0.75)
  }

  test("dowSeasonality: planted weekly cycle, exact chi-square") {
    // 14 days starting 2024-01-01 (epoch day 19723, dow 19723%7 = 4):
    // two of each weekday; the spiked weekday gets 2x12=24, others 2x5=10
    val counts = (0 until 14).map(i => if ((19723 + i) % 7 == 4) 12 else 5)
    val rows = TimeSeries.dowSeasonality(seriesDf(counts), "ts")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until 7))
    // total = 6*10 + 24 = 84, e = 12; contrib: spiked -> 144/12 = 12,
    // others -> 4/12 = 0.333333; chi2 = 12 + 6*(1/3) = 14
    val byDow = rows.map(r => r._1 -> r._2).toMap
    assert(byDow(4) == 24.0 &&
      byDow.filter(_._1 != 4).values.forall(_ == 10.0))
    assert(rows.forall(_._4 == 14.0))
    assert(rows.find(_._1 == 4).get._3 == 12.0)
  }

  test("impactWelch: hand-computed t, singleton sides yield null") {
    import spark.implicits._
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val rows = Seq(
      // type a: before {1,3} (mean 2, var 2); after {5,7,9} (mean 7, var 4)
      ("a", t(10, 1), 1.0), ("a", t(11, 1), 3.0),
      ("a", t(15, 0), 5.0), ("a", t(16, 1), 7.0), ("a", t(17, 1), 9.0),
      // type b: singleton after side -> null t
      ("b", t(10, 1), 2.0), ("b", t(11, 1), 4.0), ("b", t(20, 1), 9.0))
      .toDF("event_type", "ts", "value")
    val got = TimeSeries.impactWelch(rows, "event_type", "ts", "value",
        pivot = "2024-01-15")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 3L)
    assert(a.getDouble(3) == 2.0 && a.getDouble(4) == 7.0)
    // t = 5 / sqrt(2/2 + 4/3)
    val expected = BigDecimal(5.0 / math.sqrt(2.0 / 2 + 4.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getDouble(5) == expected)
    assert(got("b").isNullAt(5))
  }

  test("autocorrDaily of a constant series yields NaN/null acf (zero denom)") {
    val got = TimeSeries.autocorrDaily(seriesDf(Seq(5, 5, 5)), "ts", 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.isNullAt(1) || got.head.getDouble(1).isNaN)
  }

  test("holtDaily matches the hand-rolled level/trend recurrence") {
    // alpha = beta = 0.5, counts 10,20,10:
    // t1: l=10 b=0; t2: pred=10, l=15, b=0.5*(15-10)=2.5;
    // t3: pred=17.5, l=13.75, b=2.5+0.5*(13.75-15-2.5)=0.625
    val rows = TimeSeries.holtDaily(seriesDf(Seq(10, 20, 10)), "ts",
      alpha = 0.5, beta = 0.5).orderBy("day").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((10.0, 0.0, 10.0), (15.0, 2.5, 17.5),
      (13.75, 0.625, 14.375)))
  }

  test("olsTrendByGroup: exact line recovered, zero-fill, degenerates null") {
    import spark.implicits._
    // type L: perfect ramp 10,12,14 -> slope 2, intercept 10, r2 1
    // type Z: day-1 burst only; zero-filled days make its slope -5
    val rows =
      Seq.fill(10)(("2024-01-01 08:00:00", "L")) ++
        Seq.fill(12)(("2024-01-02 08:00:00", "L")) ++
        Seq.fill(14)(("2024-01-03 08:00:00", "L")) ++
        Seq.fill(10)(("2024-01-01 08:00:00", "Z"))
    val df = rows.map { case (t, g) => (java.sql.Timestamp.valueOf(t), g) }
      .toDF("ts", "g")
    val got = TimeSeries.olsTrendByGroup(df, "g", "ts").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("L") == ((3L, 2.0, 10.0, 1.0)))
    assert(got("Z")._2 == -5.0)
    // single-day calendar: time has no variance -> null slope
    val solo = TimeSeries.olsTrendByGroup(
      Seq((java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), "S"))
        .toDF("ts", "g"), "g", "ts").collect().head
    assert(solo.isNullAt(2) && solo.isNullAt(3) && solo.isNullAt(4))
  }

  test("fanoFactor: zero-filled calendar, hand-computed ratios") {
    import spark.implicits._
    // type P: 4 then 6 events (mean 5, var 2, fano 0.4);
    // type Q: 10 on day 1 ONLY - the zero-filled day 2 must count
    // (mean 5, var 50, fano 10); dropping it would read var 0
    val rows =
      Seq.fill(4)(("2024-01-01 10:00:00", "P")) ++
        Seq.fill(6)(("2024-01-02 10:00:00", "P")) ++
        Seq.fill(10)(("2024-01-01 10:00:00", "Q"))
    val df = rows.map { case (t, g) => (java.sql.Timestamp.valueOf(t), g) }
      .toDF("ts", "g")
    val got = TimeSeries.fanoFactor(df, "g", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(("P", 2L, 5.0, 2.0, 0.4), ("Q", 2L, 5.0, 50.0, 10.0)))
  }

  test("grangerLr: planted x->y lead matches an independent OLS reference") {
    import org.apache.spark.sql.functions.col
    // y_t = x_{t-1} + parity wiggle: x Granger-predicts y, not vice versa
    val xs = Seq(3, 7, 4, 9, 2, 8, 5, 10, 1, 6, 9, 4)
    val ys = 5 +: xs.init.zipWithIndex.map { case (x, i) => x + (i % 2) }
    val rows = xs.zip(ys).zipWithIndex.flatMap { case ((a, b), i) =>
      val day = f"2024-02-${i + 1}%02d 12:00:00"
      Seq.fill(a)(("click", day)) ++ Seq.fill(b)(("purchase", day))
    }
    import spark.implicits._
    val ev = rows.toDF("event_type", "d")
      .select(col("event_type"), col("d").cast("timestamp").as("ts"))
    val got = TimeSeries.grangerLr(ev, "ts", "event_type",
      "click", "purchase").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))).toMap
    // independent reference: OLS by Gaussian elimination on the lagged
    // series, LR = m ln(RSS_r/RSS_u)
    def ref(xp: Seq[Int], yp: Seq[Int], y: Seq[Int]): Double = {
      val m = y.size.toDouble
      def solve(a: Array[Array[Double]], c: Array[Double]): Array[Double] = {
        val n = c.length
        for (i <- 0 until n) {
          val p = (i until n).maxBy(r => math.abs(a(r)(i)))
          val t = a(i); a(i) = a(p); a(p) = t
          val tc = c(i); c(i) = c(p); c(p) = tc
          for (r <- i + 1 until n) {
            val f = a(r)(i) / a(i)(i)
            for (k <- i until n) a(r)(k) -= f * a(i)(k)
            c(r) -= f * c(i)
          }
        }
        val b = new Array[Double](n)
        for (i <- n - 1 to 0 by -1)
          b(i) = (c(i) - (i + 1 until n).map(k => a(i)(k) * b(k)).sum) /
            a(i)(i)
        b
      }
      def rss(cols: Seq[Seq[Double]]): Double = {
        val k = cols.size
        val a = Array.tabulate(k, k)((i, j) =>
          cols(i).zip(cols(j)).map { case (p, q) => p * q }.sum)
        val c = Array.tabulate(k)(i =>
          cols(i).zip(y).map { case (p, q) => p * q }.sum)
        val b = solve(a.map(_.clone), c.clone)
        y.indices.map { t =>
          val e = y(t) - cols.indices.map(i => b(i) * cols(i)(t)).sum
          e * e
        }.sum
      }
      val ones = Seq.fill(y.size)(1.0)
      val rssR = rss(Seq(ones, yp.map(_.toDouble)))
      val rssU = rss(Seq(ones, yp.map(_.toDouble), xp.map(_.toDouble)))
      BigDecimal(m * math.log(rssR / rssU))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val fwd = ref(xs.init, ys.init, ys.tail)
    val rev = ref(ys.init, xs.init, xs.tail)
    val (nF, lrF, rejF) = got("click->purchase")
    val (nR, lrR, _) = got("purchase->click")
    assert(nF == 11L && nR == 11L)
    assert(math.abs(lrF - fwd) < 2e-6 && math.abs(lrR - rev) < 2e-6)
    assert(rejF && lrF > lrR, s"planted lead must dominate: $lrF vs $lrR")
  }

  test("kalmanLocalLevel: hand first steps, gain converges, flat series exact") {
    // q=4, r=25; day1: l=x1=10, p=25, K=1. day2: p-=29, K=29/54,
    // l = 10 + 29/54*(64-10); day3: p2=(25/54)*29=725/54, p-=941/54,
    // K=941/(941+1350)
    val r = TimeSeries.kalmanLocalLevel(seriesDf(Seq(10, 64, 20, 30, 25)),
      "ts", q = 4.0, r = 25.0).orderBy("day").collect()
    assert(r(0).getDouble(2) == 10.0 && r(0).getDouble(3) == 25.0 &&
      r(0).getDouble(4) == 1.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k2 = 29.0 / 54.0
    assert(r(1).getDouble(4) == r6(k2))
    assert(r(1).getDouble(2) == r6(10.0 + k2 * (64.0 - 10.0)))
    assert(r(1).getDouble(3) == r6((1.0 - k2) * 29.0))
    // the gain sequence is strictly decreasing toward steady state
    val gains = r.map(_.getDouble(4))
    assert(gains.sliding(2).forall(p => p(1) < p(0)))
    // constant series: level tracks the constant exactly every day
    val flat = TimeSeries.kalmanLocalLevel(seriesDf(Seq.fill(6)(9)), "ts",
      q = 4.0, r = 25.0).collect()
    assert(flat.forall(_.getDouble(2) == 9.0))
  }

  test("ljungBox: exact alternation Q = 94.5, constants null, short series drop") {
    import org.apache.spark.sql.functions.lit
    // 5,15 alternation over 16 days: dev_t = ±80, rho_k = (-1)^k (16-k)/16
    // -> every pin lands exactly, s9 = 328_125_000, Q = 288 * 0.328125
    val alt = Seq.tabulate(16)(t => if (t % 2 == 0) 5 else 15)
    val got = TimeSeries.ljungBox(
      seriesDf(alt).withColumn("g", lit("a")), "ts", "g").collect().head
    assert(got.getString(0) == "a" && got.getLong(1) == 16L)
    assert(got.getDouble(2) == 94.5 && got.getBoolean(3))
    // constant series: zero variance -> Q and the verdict are null
    val const = TimeSeries.ljungBox(
      seriesDf(Seq.fill(16)(9)).withColumn("g", lit("c")), "ts", "g")
      .collect().head
    assert(const.isNullAt(2) && const.isNullAt(3))
    // n <= maxLag+1 days: statistic undefined at lag 7 -> excluded
    assert(TimeSeries.ljungBox(
      seriesDf(Seq(1, 2, 3, 4, 5, 6, 7, 8)).withColumn("g", lit("s")),
      "ts", "g").count() == 0L)
  }

  test("theilSenTrend: pairwise median shrugs off a planted outlier") {
    // days 1..5 with counts 10,12,14,16,100: 6 of the 10 pairwise
    // slopes are exactly 2, so the median is 2 (OLS would be dragged
    // to ~17); intercept = median of x - 2t = the clean days' value
    val r = TimeSeries.theilSenTrend(seriesDf(Seq(10, 12, 14, 16, 100)),
      "ts").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 2.0)
    // epoch day of 2024-01-01 is 19723: 10 - 2*19723 = -39436
    assert(r.getDouble(3) == -39436.0)
  }

  test("seasonalDecompose: planted weekly cycle decomposes exactly") {
    // 21 days from 2024-01-01 (epoch day 19723): 13 events on days with
    // epoch_day%7 == 4, 10 elsewhere. Every full 7-day window holds
    // exactly one spike: trend = 73/7 everywhere, the weekday means
    // reproduce the plant, residuals vanish.
    val counts = (0 until 21).map(i => if ((19723 + i) % 7 == 4) 13 else 10)
    val rows = TimeSeries.seasonalDecompose(seriesDf(counts), "ts")
      .orderBy("day").collect()
    assert(rows.length == 21)
    // first/last 3 days: no full window -> trend and residual null
    assert((rows.take(3) ++ rows.takeRight(3))
      .forall(r => r.isNullAt(3) && r.isNullAt(5)))
    val full = rows.slice(3, 18)
    assert(full.forall(_.getDouble(3) == 10.428571), "trend = round(73/7)")
    assert(full.forall(_.getDouble(5) == 0.0), "plant leaves no residual")
    // seasonal: spike weekday +18/7, others -3/7 (grand-mean centering
    // shifts by ~4e-7, below the 6dp round)
    rows.foreach { r =>
      val expected = if (r.getInt(2) == 4) 2.571429 else -0.428571
      assert(r.getDouble(4) == expected, s"dow ${r.getInt(2)}")
    }
  }

  test("holtWintersDaily matches an independent reference recurrence") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // weekly spike + gentle weekly step trend, 21 days
    val counts = (0 until 21).map(i => 10 + i / 7 + (if (i % 7 == 2) 3 else 0))
    val xs = counts.map(_.toDouble)
    val l0 = r6(xs.take(7).sum / 7.0)
    val b0 = r6((xs.slice(7, 14).sum / 7.0 - l0) / 7.0)
    var (l, b) = (l0, b0)
    val s = scala.collection.mutable.Queue(xs.take(7).map(x => r6(x - l0)): _*)
    val expected = xs.map { x =>
      val sOld = s.dequeue()
      val pred = l + b
      val f = r6(pred + sOld)
      val lN = r6(pred + 0.3 * (x - sOld - pred))
      val bN = r6(b + 0.1 * (lN - pred))
      val sN = r6(sOld + 0.2 * (x - lN - sOld))
      l = lN; b = bN; s.enqueue(sN)
      (x, f, lN, bN, sN)
    }
    val got = TimeSeries.holtWintersDaily(seriesDf(counts), "ts",
        alpha = 0.3, beta = 0.1, gamma = 0.2)
      .orderBy("day").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == expected)
  }

  test("holtWintersDaily: series shorter than two periods is empty") {
    assert(TimeSeries.holtWintersDaily(seriesDf(Seq.fill(13)(5)), "ts",
      0.3, 0.1, 0.2).count() == 0L)
  }

  test("seasonalDecompose: series shorter than the window is all-null") {
    val rows = TimeSeries.seasonalDecompose(seriesDf(Seq(5, 6, 7, 8, 9)),
      "ts").orderBy("day").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(5d, 6d, 7d, 8d, 9d))
  }

  test("forecastBacktest: linear ramp gives MASE exactly 1") {
    import org.apache.spark.sql.functions.lit
    // counts 1..21 by day: snaive error is 7 everywhere (in-sample and
    // test), naive test errors are 1..7
    val df = seriesDf((1 to 21)).withColumn("g", lit("A"))
    val r = TimeSeries.forecastBacktest(df, "g", "ts",
      horizon = 7, season = 7).collect().head
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 7L && r.getLong(2) == 7L)
    assert(r.getDouble(3) == 4.0)  // (1+...+7)/7
    assert(r.getDouble(4) == 7.0)
    assert(r.getDouble(5) == 1.0)  // 7 / 7
  }

  test("conformalSnaiveIntervals: ramp residuals are constant, coverage 1") {
    import org.apache.spark.sql.functions.lit
    // counts 1..28: every seasonal residual is exactly 7, so the
    // conformal half-width is 7 and every test day is covered
    val df = seriesDf(1 to 28).withColumn("g", lit("A"))
    val r = TimeSeries.conformalSnaiveIntervals(df, "g", "ts",
      horizon = 7, season = 7, calib = 14, alphaPct = 20).collect().head
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 14L)       // calibration days
    assert(r.getLong(2) == 7L)        // q = the constant residual
    assert(r.getLong(3) == 7L && r.getLong(4) == 7L)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 0.8)
    // a level EXPLOSION in the test week blows coverage to 0: the
    // distribution-free guarantee only holds under exchangeability
    val shifted = seriesDf((1 to 21) ++ Seq.fill(7)(1000))
      .withColumn("g", lit("A"))
    val rs = TimeSeries.conformalSnaiveIntervals(shifted, "g", "ts",
      horizon = 7, season = 7, calib = 14, alphaPct = 20).collect().head
    assert(rs.getLong(2) == 7L && rs.getDouble(5) == 0.0)
    // conformal rank: 14 calib residuals at 80% -> k = ceil(0.8*15) = 12
    // (exercised implicitly; with distinct residuals q would be the
    // 12th smallest — check via a strictly increasing residual series)
    val inc = seriesDf((1 to 14) ++ (15 to 28).map(i => i * i))
      .withColumn("g", lit("A"))
    val ri = TimeSeries.conformalSnaiveIntervals(inc, "g", "ts",
      horizon = 7, season = 7, calib = 14, alphaPct = 20).collect().head
    assert(ri.getLong(1) == 14L && ri.getLong(3) == 7L)
  }
}

package graft

import graft.ops.Analytics
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  import SparkSuite._

  private def ts(us: Long): java.sql.Timestamp =
    new java.sql.Timestamp(us / 1000) // fixture stays at ms granularity

  private def evDf(rows: Seq[(Long, Long, java.sql.Timestamp, String, java.lang.Double)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)): _*),
      StructType(Seq(
        StructField("event_id", LongType, nullable = false),
        StructField("user_id", LongType, nullable = false),
        StructField("ts", TimestampType, nullable = false),
        StructField("event_type", StringType, nullable = false),
        StructField("value", DoubleType, nullable = true))))

  test("benfordAudit: string-extracted digits, spine keeps absent digits") {
    import spark.implicits._
    import graft.ops.Analytics
    // values with leading digits 1,1,2,9; zero/negative excluded
    val df = Seq(1.5, 0.0000105, 2000.0, 0.9, 0.0, -3.0).toDF("value")
    val got = Analytics.benfordAudit(df, "value")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(4)))
      .toMap
    assert(got.keySet == (1 to 9).toSet) // all digits present via spine
    assert(got(1)._1 == 2L && got(2)._1 == 1L && got(9)._1 == 1L)
    assert(got(3)._1 == 0L) // absent digit still a cell
    // chi2 identical on every row and strictly positive here
    assert(got.values.map(_._2).toSet.size == 1 && got(1)._2 > 0)
    // power-of-ten edge: 1000000.0 (v6 = 1e12) must read digit 1, not 9
    val p10 = Analytics.benfordAudit(Seq(1000000.0).toDF("value"), "value")
      .filter(col("cnt") > 0).collect()
    assert(p10.length == 1 && p10.head.getInt(0) == 1)
  }

  test("maxConcurrencyDaily: overlap peaks, adjacency, midnight carryover") {
    def t(day: Int, h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // day 1: u1 10:00-10:20, u2 10:10-10:15, u3 single event at 10:20.
    //        Peak 2 twice: u1+u2 at 10:10, and u1+u3 at 10:20 — the
    //        latter ONLY because presence is end-inclusive (u1's -1
    //        fires just after 10:20); end-exclusive would read 1 there.
    // day 2->3: u4 session 23:50-00:10 spans midnight: day 3 carryover 1
    val rows = Seq(
      (1L, 1L, t(1, 10, 0), "v"), (2L, 1L, t(1, 10, 20), "v"),
      (3L, 2L, t(1, 10, 10), "v"), (4L, 2L, t(1, 10, 15), "v"),
      (5L, 3L, t(1, 10, 20), "v"),
      (6L, 4L, t(2, 23, 50), "v"), (7L, 4L, t(3, 0, 10), "v"))
      .map(r => (r._1, r._2, r._3, r._4, null: java.lang.Double))
    val got = Analytics.maxConcurrencyDaily(evDf(rows), "user_id", "ts",
        gapMinutes = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 2L)
    assert(got("2024-01-02") == 1L)
    assert(got("2024-01-03") == 1L) // carryover only: u4 still open
  }

  test("rfmSegments: hand-built terciles land users in the right cells") {
    // 3 users, clean separation on every dimension. maxTs = day 30.
    // u1: last day 30 (r=0),  9 events, value 90  -> r0, f2, m2
    // u2: last day 20 (r=10), 6 events, value 60  -> r1, f1, m1
    // u3: last day 10 (r=20), 3 events, value 30  -> r2, f0, m0
    def t(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d ${10 + i}%02d:00:00")
    val rows = (1 to 9).map(i => (i.toLong, 1L, t(if (i == 9) 30 else 5, i % 9), "v", java.lang.Double.valueOf(10.0))) ++
      (1 to 6).map(i => (20L + i, 2L, t(if (i == 6) 20 else 5, i % 9), "v", java.lang.Double.valueOf(10.0))) ++
      (1 to 3).map(i => (40L + i, 3L, t(if (i == 3) 10 else 5, i % 9), "v", java.lang.Double.valueOf(10.0)))
    val got = Analytics.rfmSegments(evDf(rows), "user_id", "ts", "value")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got == Set((0, 2, 2, 1L), (1, 1, 1, 1L), (2, 0, 0, 1L)))
  }

  test("moment states merge associatively and finalize to the rescan answer") {
    import spark.implicits._
    import graft.ops.Incremental
    val all = Seq((0, "a", 1.0), (1, "a", 3.0), (2, "a", 5.0), (3, "b", 2.0))
      .toDF("i", "k", "v")
    // three different batch splits must all finalize identically
    def split(parts: Seq[Seq[Int]]) = Incremental.finalizeMoments(
      Incremental.mergeStates(parts.map(idx =>
        Incremental.momentState(
          all.filter(col("i").isin(idx: _*)).drop("i"),
          Seq("k"), "v")), Seq("k")), Seq("k"))
    val direct = Incremental.finalizeMoments(
      Incremental.momentState(all.drop("i"), Seq("k"), "v"), Seq("k"))
      .collect().map(_.toSeq).toSet
    assert(split(Seq(Seq(0), Seq(1, 2), Seq(3))).collect()
      .map(_.toSeq).toSet == direct)
    assert(split(Seq(Seq(0, 3), Seq(1), Seq(2))).collect()
      .map(_.toSeq).toSet == direct)
    // and the finalized numbers are the textbook ones
    val a = direct.find(_.head == "a").get
    assert(a(1) == 3L && a(2) == 3.0 && a(3) == 2.0 && a(4) == 1.0 && a(5) == 5.0)
    val b = direct.find(_.head == "b").get
    assert(b(1) == 1L && b(3) == null) // singleton: no sample stddev
  }

  test("histogram states: merge == rescan, hand-computed estimate, clamp") {
    import spark.implicits._
    import graft.ops.Incremental
    // values 0.5..9.5, one per [i, i+1) bin of [0,10)x10
    val all = (0 until 10).map(i => (i, "g", i + 0.5)).toDF("i", "k", "v")
    def quant(st: DataFrame) = Incremental.histogramQuantiles(
      st, Seq("k"), 0.0, 10.0, 10, Seq(0.5)).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSet
    val direct = quant(Incremental.histogramState(
      all.drop("i"), Seq("k"), "v", 0.0, 10.0, 10))
    val merged = quant(Incremental.mergeHistograms(
      Seq(Seq(0, 3, 7), Seq(1, 2, 9), Seq(4, 5, 6, 8)).map(idx =>
        Incremental.histogramState(all.filter(col("i").isin(idx: _*))
          .drop("i"), Seq("k"), "v", 0.0, 10.0, 10)), Seq("k")))
    assert(merged == direct)
    // p=0.5, N=10: target 5 lands at the end of bin 4 -> 4 + 1/1 = 5.0
    assert(direct == Set(("g", 0.5, 10L, 5.0)))
    // out-of-range values clamp into the edge bins
    val clamped = Incremental.histogramState(
      Seq(("g", -3.0), ("g", 42.0)).toDF("k", "v"),
      Seq("k"), "v", 0.0, 10.0, 10)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(clamped == Set((0, 1L), (9, 1L)))
  }

  test("newVsReturning: first-day split and cumulative curve") {
    import spark.implicits._
    // day1: A,B (A twice - no double count); day2: A,C
    val rows = Seq(
      ("2024-01-01 10:00:00", "A"), ("2024-01-01 11:00:00", "A"),
      ("2024-01-01 12:00:00", "B"), ("2024-01-02 09:00:00", "A"),
      ("2024-01-02 10:00:00", "C"))
      .map { case (t, u) => (java.sql.Timestamp.valueOf(t), u) }
      .toDF("ts", "u")
    val got = Analytics.newVsReturning(rows, "u", "ts")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((2L, 2L, 0L, 2L), (2L, 1L, 1L, 3L)))
  }

  test("interarrivalQuantiles: exact gaps, cross-user gaps excluded") {
    val rows = Seq(
      (1L, 1L, ts(0L), "v", null), (2L, 1L, ts(100000L), "v", null),
      (3L, 1L, ts(300000L), "v", null), // user 1 gaps: 100ms, 200ms
      (4L, 2L, ts(1000000L), "v", null), (5L, 2L, ts(1400000L), "v", null))
      .map(r => (r._1, r._2, r._3, r._4, null: java.lang.Double))
    val got = Analytics.interarrivalQuantiles(evDf(rows), "user_id", "ts",
      "event_id").head()
    // gaps (us): user1 {100000, 200000}, user2 {400000}; cross-user
    // boundaries contribute nothing
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == 200000.0) // p50 of the three gaps
  }

  test("lengthBuckets: hand-computed buckets, waste, open top bucket") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "a b c"),                        // 3 tokens  -> bucket 1 (2-3)
      (2L, "a b"),                          // 2 tokens  -> bucket 1
      (3L, "a"),                            // 1 token   -> bucket 0
      (4L, (1 to 9000).map(_ => "x").mkString(" "))) // > 2^12 -> top
      .toDF("doc_id", "text")
    val got = TextAnalysis.lengthBuckets(docs, "doc_id", "text", maxBucket = 12)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // bucket 1: 2 docs, 5 tokens, pad_to 3, waste 2*3-5 = 1
    assert(got(1) == ((2L, 5L, 3L, 1L)))
    // bucket 0: 1 doc of 1 token, pad_to 1, zero waste
    assert(got(0) == ((1L, 1L, 1L, 0L)))
    // top bucket pads to its actual max (9000 > 2^13-1)
    assert(got(12) == ((1L, 9000L, 9000L, 0L)))
  }

  test("windowedFunnel binds greedily and respects the conversion window") {
    import spark.implicits._
    def t(us: Long) = ts(us)
    val W = 100L // microseconds window for the fixture
    val rows = Seq(
      // user 1: signup@0, click@50 (in window), purchase@120 (<=50+100: in)
      (1L, 1L, t(0L), "signup", null), (2L, 1L, t(50000L), "click", null),
      (3L, 1L, t(120000L), "purchase", null),
      // user 2: signup@0, click@150ms — OUTSIDE the 100ms window
      (4L, 2L, t(0L), "signup", null), (5L, 2L, t(150000L), "click", null),
      // user 3: click BEFORE signup only — never enters stage 2;
      // also a purchase with no bound click
      (6L, 3L, t(50000L), "click", null), (7L, 3L, t(60000L), "signup", null),
      (8L, 3L, t(70000L), "purchase", null),
      // user 4: signup, two clicks — greedy binds the FIRST (@30ms), so
      // the purchase must be within 100ms of 30ms (it is, @90ms)
      (9L, 4L, t(0L), "signup", null), (10L, 4L, t(30000L), "click", null),
      (11L, 4L, t(95000L), "click", null), (12L, 4L, t(90000L), "purchase", null))
      .map(r => (r._1, r._2, r._3, r._4, null: java.lang.Double))
    val got = Analytics.windowedFunnel(evDf(rows), "user_id", "ts",
      "event_type", Seq("signup", "click", "purchase"),
      windowMicros = 100000L).head()
    // stage1: users 1,2,3,4; stage2: 1,4 (user 3's click precedes signup);
    // stage3: 1,4
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((4L, 2L, 2L)))
    assert(got.getDouble(3) == 0.5 && got.getDouble(4) == 0.5)
  }

  test("kAnonymity flags only below-k groups; exactly-k groups are anonymous") {
    import spark.implicits._
    // group a: 3 rows (< k=3? no — use k=3: flagged at 2, safe at 3)
    val rows = Seq.fill(3)(("en", "web")) ++ Seq.fill(2)(("en", "books")) ++
      Seq.fill(1)(("fr", "web"))
    val got = Analytics.kAnonymity(rows.toDF("lang", "source"),
      Seq(col("lang"), col("source")), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // (en, web) has exactly k members -> anonymous, not flagged
    assert(got == Set(("en", "books", 2L), ("fr", "web", 1L)))
    assertThrows[IllegalArgumentException] {
      Analytics.kAnonymity(rows.toDF("lang", "source"),
        Seq(col("lang")), k = 1)
    }
  }

  test("lDiversity flags homogeneous groups a k-anonymity pass misses") {
    import spark.implicits._
    // (en, 0): 4 rows but ALL from web -> k-anonymous at k=4, yet
    // 1-diverse; (fr, 0): two sources -> still < l=3; (de, 0): three
    // sources -> safe
    val rows = Seq.fill(4)(("en", 0L, "web")) ++
      Seq(("fr", 0L, "web"), ("fr", 0L, "books")) ++
      Seq(("de", 0L, "web"), ("de", 0L, "books"), ("de", 0L, "wiki"))
    val got = Analytics.lDiversity(rows.toDF("lang", "band", "src"),
        Seq(col("lang"), col("band")), col("src"), l = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    // en: H = 0 (homogeneous); fr: H = 1 bit (50/50 over two sources)
    assert(got == Set(("en", 4L, 1L, 0.0), ("fr", 2L, 2L, 1.0)))
    assertThrows[IllegalArgumentException] {
      Analytics.lDiversity(rows.toDF("lang", "band", "src"),
        Seq(col("lang")), col("src"), l = 1)
    }
  }

  test("tCloseness flags skewed groups an l-diversity pass misses") {
    import spark.implicits._
    // global source mix: web 5 / books 5. en and fr are each pure
    // (TVD 0.5 from global); de mirrors the global mix (TVD 0).
    val rows = Seq.fill(4)(("en", "web")) ++ Seq.fill(4)(("fr", "books")) ++
      Seq(("de", "web"), ("de", "books"))
    val got = Analytics.tCloseness(rows.toDF("lang", "src"),
        Seq(col("lang")), col("src"), t = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("en", 4L, 0.5), ("fr", 4L, 0.5)))
    assertThrows[IllegalArgumentException] {
      Analytics.tCloseness(rows.toDF("lang", "src"),
        Seq(col("lang")), col("src"), t = 0.0)
    }
  }

  test("shapleyAttribution: hand 2-channel coalition values") {
    import spark.implicits._
    // v(∅)=1 (u5), v(a)=0.5 (u1,u2), v(b)=0 (u4), v(ab)=1 (u3)
    // φ_a = ½[(0.5−1)+(1−0)] = 0.25; φ_b = ½[(0−1)+(1−0.5)] = −0.25
    val ev = Seq((1L, "a"), (1L, "z"), (2L, "a"), (3L, "a"), (3L, "b"),
      (3L, "z"), (4L, "b"), (5L, "z")).toDF("uid", "t")
    val got = Analytics.shapleyAttribution(ev, "uid", "t", "z",
        Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 0.25, "b" -> -0.25))
    // efficiency check on a fully-converting corpus: φ sums to
    // v(full) − v(∅) = 0 when conversion is unconditional
    val all = Seq((1L, "a"), (1L, "b"), (1L, "z"), (2L, "a"), (2L, "b"),
      (2L, "z")).toDF("uid", "t")
    val phis = Analytics.shapleyAttribution(all, "uid", "t", "z",
      Seq("a", "b")).collect().map(_.getDouble(1))
    // only mask 3 observed: v(ab)=1, everything else 0 ->
    // φ_a = φ_b = ½·[(0−0)+(1−0)] = 0.5
    assert(phis.sorted.toSeq == Seq(0.5, 0.5))
  }

  test("rollingByKey includes the window boundary and splits by key") {
    val day = 24L * 3600 * 1000000
    val rows = Seq(
      // user 1: events at t=0, t=7d (exactly on the frame boundary), t=10d
      (1L, 1L, ts(0), "a", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(7 * day), "a", java.lang.Double.valueOf(2.0)),
      (3L, 1L, ts(10 * day), "a", java.lang.Double.valueOf(4.0)),
      // user 2: single event — window of itself only
      (4L, 2L, ts(3 * day), "a", java.lang.Double.valueOf(8.0)))
    val got = Analytics.rollingByKey(evDf(rows), "user_id", "ts", "value",
      windowMicros = 7 * day, outCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // event 2 at exactly t0+7d: the frame [ts-7d, ts] INCLUDES event 1
    assert(got(1L) == ((1L, 1.0)))
    assert(got(2L) == ((2L, 3.0)), "boundary event must be included")
    // event 3 at 10d: sees event 2 (3d earlier) but not event 1 (10d)
    assert(got(3L) == ((2L, 6.0)))
    assert(got(4L) == ((1L, 8.0)), "keys must not mix")
  }

  test("pivotCounts zero-fills absent combos and drops unpinned values") {
    val rows = Seq(
      (1L, 1L, ts(0), "a", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(1000), "a", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(2000), "b", java.lang.Double.valueOf(1.0)),
      (4L, 1L, ts(3000), "zzz", java.lang.Double.valueOf(1.0))) // not pinned
    val got = Analytics.pivotCounts(evDf(rows), col("user_id"), "uid",
      "event_type", Seq("a", "b", "c")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("a") == 2L && r.getAs[Long]("b") == 1L)
    assert(r.getAs[Long]("c") == 0L, "absent combo must be 0, not null")
    assert(!got.head.schema.fieldNames.contains("zzz"))
  }

  test("zscoreOutliers flags planted outliers, never constant or singleton groups") {
    val vals = Seq(10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 10.2, 9.8, 100.0)
    val normal = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, ts(i * 1000000L), "n", java.lang.Double.valueOf(v))
    }
    val constant = (100L to 104L).map(i =>
      (i, 1L, ts(i * 1000000L), "const", java.lang.Double.valueOf(5.0)))
    val single = Seq((200L, 1L, ts(0), "one", java.lang.Double.valueOf(3.0)))
    val got = Analytics.zscoreOutliers(evDf(normal ++ constant ++ single),
      "event_type", "value", minZ = 2.0, outCols = Seq("event_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(8L), s"only the planted 100.0 outlier, got $got")
  }

  test("quantileBins: ties at a threshold land in the lower bin, bins are balanced") {
    // 20 distinct scores 1..20: quartile thresholds (k=4) interpolate to
    // 5.75, 10.5, 15.25 — bins of exactly 5
    val rows = (1 to 20).map(i =>
      (i.toLong, 1L, ts(i * 1000000L), "a", java.lang.Double.valueOf(i.toDouble)))
    val got = Analytics.quantileBins(evDf(rows), col("value"), k = 4,
      outCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert((1 to 20).forall(i => got(i.toLong) == (i - 1) / 5),
      s"expected 4 equal bins, got $got")

    // planted tie AT an exact threshold: scores {0,0,10,10} with k=2 →
    // median 5; both 0s below (bin 0), both 10s above (bin 1); a score
    // EQUAL to a threshold stays in the lower bin
    val tie = Seq(0.0, 0.0, 5.0, 10.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, ts(i * 1000000L), "a", java.lang.Double.valueOf(v))
    }
    val got2 = Analytics.quantileBins(evDf(tie), col("value"), k = 2,
      outCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    // median of {0,0,5,10} = 2.5; score 5 and 10 above, 0s below
    assert(got2(0L)._2 == 0 && got2(1L)._2 == 0)
    assert(got2(2L)._2 == 1 && got2(3L)._2 == 1)
    // and a direct boundary check: {1,2,3} k=3 → thresholds 1.666.., 2.333..;
    // score 2 sits between → bin 1
    val three = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, ts(i * 1000000L), "a", java.lang.Double.valueOf(v))
    }
    val got3 = Analytics.quantileBins(evDf(three), col("value"), k = 3,
      outCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got3 == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("forget cascade counts deletions level by level, dedups fan-in keys") {
    import graft.ops.Forget
    def df2(name1: String, name2: String, rows: Seq[(Long, Long)]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
        StructType(Seq(StructField(name1, LongType, nullable = false),
          StructField(name2, LongType, nullable = false))))
    // users 1..4; forget {1, 2}; user 1 has 2 orders, user 2 none;
    // order 10 has 3 items, order 11 has 1; order 20 (user 3) survives
    val users = df2("uid", "uid2", Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    val orders = df2("o_uid", "oid",
      Seq((1L, 10L), (1L, 11L), (3L, 20L)))
    val items = df2("i_oid", "iid",
      Seq((10L, 100L), (10L, 101L), (10L, 102L), (11L, 103L), (20L, 104L)))
    val seed = users.filter(col("uid") <= 2L).select("uid")
    val got = Forget.cascadeCounts(seed, Seq(
      Forget.Level("users", users, "uid", "uid"),
      Forget.Level("orders", orders, "o_uid", "oid"),
      Forget.Level("items", items, "i_oid", "iid")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("users") == ((2L, 2L)))
    assert(got("orders") == ((2L, 1L)))
    assert(got("items") == ((4L, 1L)))
  }

  test("dpLaplaceHistogram: exact JVM replay of the pinned Laplace draw") {
    import graft.ops.Forget
    import spark.implicits._
    val df = (Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Forget.dpLaplaceHistogram(df, col("k"), epsilon = 0.5)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def expect(key: String, n: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dpnoise:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(13), 16)
      val c = (h.toDouble + 0.5) / 4503599627370496.0 - 0.5
      val noise = -(1.0 / 0.5) * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, r6(n + noise), r6(math.abs(noise)), 0.5)
    }
    assert(got == Map("a" -> expect("a", 30L), "b" -> expect("b", 12L),
      "c" -> expect("c", 1L)))
    // the three draws must not collide (independent per-key noise)
    assert(got.values.map(_._3).toSet.size == 3)
  }

  test("rebalanceGroups keeps the smallest group whole and replays the md5 draw") {
    import graft.ops.Sampling
    // skewed corpus: group a = 40 rows, b = 10, c = 5 (min)
    val rows = ((0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b")) ++
      (200 until 205).map(i => (i.toLong, "c")))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("grp", StringType, nullable = false))))
    val kept = Sampling.rebalanceGroups(df, "doc_id", "grp")
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    // smallest group survives wholesale (rate exactly 1.0)
    assert((200L until 205L).forall(kept))
    // JVM replay of the floor-threshold predicate for the other groups
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def thr(rate: Double): String =
      ("0" * 8 + java.lang.Long.toHexString(math.floor(rate * 4294967296.0).toLong))
        .takeRight(8)
    val expect = rows.filter { case (id, g) =>
      val rate = g match { case "a" => 5.0 / 40; case "b" => 5.0 / 10; case _ => 1.0 }
      rate >= 1.0 || md5hex(s"mix:$id") < thr(rate)
    }.map(_._1).toSet
    assert(kept == expect)
  }

  test("temperatureResample: α=1 keeps all, α=0 equals uniform rebalance, α=0.5 between") {
    import graft.ops.Sampling
    val rows = ((0 until 400).map(i => (i.toLong, "a")) ++
      (1000 until 1050).map(i => (i.toLong, "b")) ++
      (2000 until 2010).map(i => (i.toLong, "c")))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("grp", StringType, nullable = false))))
    def kept(alpha: Double): Map[String, Set[Long]] =
      Sampling.temperatureResample(df, "doc_id", "grp", alpha, salt = "mix")
        .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("doc_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // α=1: natural mixture — every row survives (rate_g = 1 for all g)
    assert(kept(1.0).values.map(_.size).sum == rows.size)
    // α=0: the uniform special case — identical SET to rebalanceGroups
    // (same salt ⇒ same draws)
    val uniform = Sampling.rebalanceGroups(df, "doc_id", "grp")
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(kept(0.0).values.flatten.toSet == uniform)
    // α=0.5: smallest group whole; large groups thinned to between
    // their α=0 and α=1 sizes, and mixture ordering is preserved
    val half = kept(0.5)
    assert(half("c") == (2000L until 2010L).toSet)
    val aSize = half("a").size
    assert(aSize > uniform.count(_ < 400L) && aSize < 400,
      s"α=0.5 kept $aSize of group a")
    // expected rate sqrt(10/400) = 0.158 → ~63 of 400; allow wide band
    assert(aSize > 30 && aSize < 110, s"α=0.5 kept $aSize of group a")
  }

  test("temperatureMix: normalized sqrt weights, exact rates, md5 replay") {
    import graft.ops.Sampling
    // sources of 100 and 400 docs: α=0.5 → s9 = 10e9, 20e9 → w = 1/3,
    // 2/3; target 150 → rate_a = 150·(1/3)/100 = 0.5, rate_b =
    // 150·(2/3)/400 = 0.25 — all exact in doubles
    val rows = (0 until 100).map(i => (i.toLong, "a")) ++
      (1000 until 1400).map(i => (i.toLong, "b"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("src", StringType, nullable = false))))
    val got = Sampling.temperatureMix(df, "doc_id", "src", alpha = 0.5,
        targetRows = 150)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Double]("mix_w"), r.getAs[Double]("rate")))
    val byGrp = got.groupBy(_._2)
    assert(byGrp("a").forall(t => t._3 == 0.333333 && t._4 == 0.5),
      s"${byGrp("a").take(2).toSeq}")
    assert(byGrp("b").forall(t => t._3 == 0.666667 && t._4 == 0.25),
      s"${byGrp("b").take(2).toSeq}")
    // exact JVM replay of the kept set (same md5 floor-threshold idiom
    // the oracle uses)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def thr(rate: Double): String =
      ("0" * 8 + java.lang.Long.toHexString(
        math.floor(rate * 4294967296.0).toLong)).takeRight(8)
    val expect = rows.filter { case (id, g) =>
      md5hex(s"tmix:$id") < thr(if (g == "a") 0.5 else 0.25)
    }.map(_._1).toSet
    assert(got.map(_._1).toSet == expect)
    // α=1 is the natural mixture: every source draws at the SAME rate
    // targetRows/total (here 150/500 = 0.3)
    val nat = Sampling.temperatureMix(df, "doc_id", "src", alpha = 1.0,
        targetRows = 150)
      .collect().map(r => r.getAs[Double]("rate")).toSet
    assert(nat == Set(0.3))
    // over-target: rates cap at 1 and everything is kept whole
    val all = Sampling.temperatureMix(df, "doc_id", "src", alpha = 0.5,
        targetRows = 10000)
      .collect()
    assert(all.length == rows.size &&
      all.forall(_.getAs[Double]("rate") == 1.0))
  }

  test("upsertMerge: last writer wins, update wins version ties, inserts survive") {
    import graft.ops.Merge
    def snap(rows: Seq[(Long, String, Long)]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
        StructType(Seq(StructField("k", LongType, nullable = false),
          StructField("payload", StringType, nullable = false),
          StructField("v", LongType, nullable = false))))
    val base = snap(Seq((1L, "b1", 5L), (2L, "b2", 5L), (3L, "b3", 5L)))
    val updates = snap(Seq(
      (1L, "u1", 6L), // newer version: wins
      (2L, "u2", 5L), // SAME version: update side must win
      (3L, "u3", 4L), // stale update: base survives
      (4L, "u4", 1L))) // new key: inserted
    val got = Merge.upsertMerge(base, updates, "k", "v")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (("u1", 6L)), 2L -> (("u2", 5L)),
      3L -> (("b3", 5L)), 4L -> (("u4", 1L))))
  }

  test("Tables.events adapts to both ts fixture encodings") {
    // The fixture's ts column has shipped as TIMESTAMP(NANOS) (loads as
    // LongType under the legacy flag) and as TIMESTAMP(MICROS) across
    // driver generations; the round-6 regression was an unconditional
    // nanos rewrite throwing on micros fixtures. The micros path is
    // covered by every events query against the real fixture; this
    // pins the nanos-as-long branch with a synthetic fixture.
    val dir = java.nio.file.Files.createTempDirectory("graft-evts").toString
    val nanos = 1767225600123456000L // 2026-01-01 00:00:00.123456 UTC in ns
    spark.range(1).select(
        lit(nanos).as("ts"), lit(7L).as("user_id"),
        lit("click").as("event_type"), lit(1.5d).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == nanos / 1000, s"micros $got") // exact truncation to us
    // and the real (micros) fixture loads through the other branch
    val real = Tables.events(spark, "/root/testdata/sf0.001")
    assert(real.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(real.select(count(lit(1))).head().getLong(0) > 0)
  }

  test("plan shapes: one fused Window for rolling, broadcast z-score, one-scan DQ") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)

    // rollingByKey: exactly one Window node (both frames fused) and one
    // shuffle — a second Window would mean the fusion regressed
    // AQE's toString renders the final AND initial plans — count nodes
    // in the final section only
    def finalPlan(df: DataFrame): String =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val rolling = Analytics.rollingByKey(ev, "user_id", "ts", "value",
      7L * 24 * 3600 * 1000000, Seq("event_id"))
    rolling.collect()
    val rPlan = finalPlan(rolling)
    assert(rPlan.sliding(7).count(_ == "Window ") == 1, rPlan.take(1500))
    assert(rPlan.sliding(9).count(_ == "Exchange ") <= 1, rPlan.take(1500))

    // zscoreOutliers: the stats side must come back as a broadcast
    // join, not a shuffle join or a full-data window
    val z = Analytics.zscoreOutliers(ev, "event_type", "value", 2.5,
      Seq("event_id"))
    z.collect()
    val zPlan = finalPlan(z)
    assert(zPlan.contains("BroadcastHashJoin"), zPlan.take(1500))
    assert(!zPlan.contains("SortMergeJoin"), zPlan.take(1500))
    assert(!zPlan.contains("Window"), zPlan.take(1500))

    // dqSuite: one scan of the input — a union-of-selects form would
    // scan once per constraint
    val dq = Analytics.dqSuite(ev,
      Seq(min(col("value")).as("v_min"), max(col("value")).as("v_max")),
      Seq(Analytics.Constraint("bounds", col("v_max"), col("v_min") >= 0.0)))
    dq.collect()
    val dqPlan = finalPlan(dq)
    assert(dqPlan.sliding(16).count(_ == "FileScan parquet") == 1,
      dqPlan.take(1500))
  }

  test("empty inputs: every analytics operator returns empty or defined rows, never throws") {
    import graft.ops.{Analytics, Merge, Sampling}
    val empty = evDf(Seq.empty)
    assert(Analytics.rollingByKey(empty, "user_id", "ts", "value",
      1000000L, Seq("event_id")).count() == 0)
    assert(Analytics.pivotCounts(empty, col("user_id"), "uid",
      "event_type", Seq("a", "b")).count() == 0)
    assert(Analytics.zscoreOutliers(empty, "event_type", "value", 2.0,
      Seq("event_id")).count() == 0)
    assert(Analytics.quantileBins(empty, col("value"), 4,
      Seq("event_id")).count() == 0)
    assert(Sampling.rebalanceGroups(empty.select("event_id", "event_type"),
      "event_id", "event_type").count() == 0)
    // dqSuite on empty input: the audit must still emit one row per
    // constraint (an empty feed is a FINDING, not an error)
    val dq = Analytics.dqSuite(empty,
      Seq(count(lit(1)).cast("double").as("n")),
      Seq(Analytics.Constraint("nonempty", col("n"), col("n") > 0)))
      .collect()
    assert(dq.length == 1 && dq.head.getDouble(1) == 0.0 &&
      !dq.head.getBoolean(2))
    // merge with an empty update batch is the identity; empty base
    // yields exactly the updates
    val one = evDf(Seq((1L, 1L, ts(0), "a", java.lang.Double.valueOf(1.0))))
      .select(col("event_id").as("k"), col("event_type").as("p"),
        col("user_id").as("v"))
    val emptySnap = one.filter(lit(false))
    assert(Merge.upsertMerge(one, emptySnap, "k", "v").count() == 1)
    assert(Merge.upsertMerge(emptySnap, one, "k", "v").count() == 1)
    // forget cascade with an empty seed deletes nothing anywhere
    val cas = graft.ops.Forget.cascadeCounts(
      one.select(col("k")).filter(lit(false)),
      Seq(graft.ops.Forget.Level("t", one, "k", "k")))
      .collect()
    assert(cas.length == 1 && cas.head.getLong(1) == 0L &&
      cas.head.getLong(2) == 1L)
  }

  test("dqSuite computes the suite in one scan and flags planted violations") {
    val rows = Seq(
      (1L, 1L, ts(0), "a", java.lang.Double.valueOf(1.0)),
      (1L, 2L, ts(1000000L), "a", java.lang.Double.valueOf(-5.0)), // dup id, oob value
      (3L, 3L, ts(2000000L), "weird", null.asInstanceOf[java.lang.Double]))
    import Analytics.Constraint
    val got = Analytics.dqSuite(evDf(rows),
      aggs = Seq(
        (count(col("value")) / count(lit(1))).as("v_complete"),
        (count_distinct(col("event_id")) === count(lit(1)))
          .cast("double").as("eid_unique"),
        min(col("value")).as("v_min"),
        sum(when(!col("event_type").isin("a", "b"), 1L).otherwise(0L))
          .cast("double").as("bad_domain")),
      constraints = Seq(
        Constraint("complete", round(col("v_complete"), 6), col("v_complete") === 1.0),
        Constraint("unique", col("eid_unique"), col("eid_unique") === 1.0),
        Constraint("bounds", col("v_min"), col("v_min") >= 0.0),
        Constraint("domain", col("bad_domain"), col("bad_domain") === 0.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got("complete")._2 == false && math.abs(got("complete")._1 - 2.0 / 3) < 1e-6)
    assert(got("unique") == ((0.0, false)))
    assert(got("bounds") == ((-5.0, false)))
    assert(got("domain") == ((1.0, false)))
  }

  test("scd2 collapses repeats and emits null-terminated validity chains") {
    import graft.ops.Merge
    // user 1: a a b a  -> versions a[1,3) b[3,4) a[4,null)
    // user 2: single event -> one current row; tie at t=5 pinned by id
    val rows = Seq(
      (1L, 1L, ts(1000000L), "a", java.lang.Double.valueOf(0)),
      (2L, 1L, ts(2000000L), "a", java.lang.Double.valueOf(0)),
      (3L, 1L, ts(3000000L), "b", java.lang.Double.valueOf(0)),
      (4L, 1L, ts(4000000L), "a", java.lang.Double.valueOf(0)),
      (9L, 2L, ts(5000000L), "x", java.lang.Double.valueOf(0)))
    val got = Merge.scd2(evDf(rows).select("user_id", "event_id", "ts",
        "event_type"), "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[String]("event_type"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.getTime),
          r.getAs[Boolean]("is_current")))).toMap
    assert(got.keySet == Set(1L, 3L, 4L, 9L), s"repeat (id=2) collapsed: $got")
    assert(got(1L) == (("a", Some(ts(3000000L).getTime), false)))
    assert(got(3L) == (("b", Some(ts(4000000L).getTime), false)))
    assert(got(4L) == (("a", None, true)))
    assert(got(9L) == (("x", None, true)))
  }

  test("dailySpineCumulative zero-fills gap days and accumulates") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")
    // events on Jan 1 (x2), Jan 2, Jan 5 — Jan 3 and 4 are gaps
    val rows = Seq((1L, 1L, day(1), "e", java.lang.Double.valueOf(0)),
      (2L, 1L, day(1), "e", java.lang.Double.valueOf(0)),
      (3L, 1L, day(2), "e", java.lang.Double.valueOf(0)),
      (4L, 1L, day(5), "e", java.lang.Double.valueOf(0)))
    val got = Analytics.dailySpineCumulative(evDf(rows), col("ts"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2026-01-01", 2L, 2L), ("2026-01-02", 1L, 3L),
      ("2026-01-03", 0L, 3L), ("2026-01-04", 0L, 3L),
      ("2026-01-05", 1L, 4L)))
  }

  test("refIntegrity counts orphans (not null FKs) and unreferenced parents") {
    val child = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, java.lang.Long.valueOf(10L)), // ok
        Row(2L, java.lang.Long.valueOf(99L)), // orphan
        Row(3L, null.asInstanceOf[java.lang.Long]), // null FK: not an orphan
        Row(4L, java.lang.Long.valueOf(10L))), // ok (dup FK)
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("fk", LongType, nullable = true))))
    val parent = spark.createDataFrame(
      java.util.Arrays.asList(Row(10L), Row(20L), Row(30L)),
      StructType(Seq(StructField("pk", LongType, nullable = false))))
    val got = Analytics.refIntegrity(
      Seq(("c->p", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("c->p", 1L, 2L)),
      s"1 orphan (id=2), 2 unreferenced parents (20, 30): $got")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("transitionMatrix: hand-computed steps, ts ties pinned by event_id") {
    // user 1: a->b->b->c ; user 2: a->b then a tie at t=5 resolved by
    // event_id (10 before 11): ...->a->c
    val rows = Seq(
      (1L, 1L, ts(1000000L), "a", java.lang.Double.valueOf(0)),
      (2L, 1L, ts(2000000L), "b", java.lang.Double.valueOf(0)),
      (3L, 1L, ts(3000000L), "b", java.lang.Double.valueOf(0)),
      (4L, 1L, ts(4000000L), "c", java.lang.Double.valueOf(0)),
      (9L, 2L, ts(4000000L), "a", java.lang.Double.valueOf(0)),
      (10L, 2L, ts(5000000L), "a", java.lang.Double.valueOf(0)),
      (11L, 2L, ts(5000000L), "c", java.lang.Double.valueOf(0)))
    val got = Analytics.transitionMatrix(evDf(rows), "user_id", "ts",
      "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from a: a->b (u1), a->a (u2 tie order), a->c (u2) — 3 steps
    assert(got(("a", "b")) == ((1L, round6(1.0 / 3))))
    assert(got(("a", "a")) == ((1L, round6(1.0 / 3))))
    assert(got(("a", "c")) == ((1L, round6(1.0 / 3))))
    // from b: b->b, b->c
    assert(got(("b", "b")) == ((1L, 0.5)) && got(("b", "c")) == ((1L, 0.5)))
    assert(got.size == 5, "terminal events emit no step")
  }

  test("tokenBudgetMix: rates from token sums, wholesale cap, unknown-group drop") {
    import graft.ops.Sampling
    // grp a: 10 docs x 8 tokens = 80; grp b: 4 docs x 5 = 20; grp c: 2 docs
    val rows = (0 until 10).map(i => (i.toLong, "a", Seq.fill(8)("w").mkString(" "))) ++
      (100 until 104).map(i => (i.toLong, "b", Seq.fill(5)("w").mkString(" "))) ++
      (200 until 202).map(i => (i.toLong, "c", "x y"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("grp", StringType, nullable = false),
        StructField("text", StringType, nullable = false))))
    // budget 60, weights a=0.5, b=0.5: a gets 30/80 = 0.375; b wants 30
    // but has 20 -> rate 1, kept wholesale; c unweighted -> dropped
    val got = Sampling.tokenBudgetMix(df, "doc_id", "grp", "text",
      weights = Seq("a" -> 0.5, "b" -> 0.5), budgetTokens = 60)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp"),
        r.getAs[Int]("n_toks"), r.getAs[Double]("rate")))
    val byGrp = got.groupBy(_._2)
    assert(!byGrp.contains("c"), "unweighted group must be dropped")
    assert(byGrp("b").map(_._1).toSet == (100L until 104L).toSet,
      "under-supplied group kept wholesale")
    assert(byGrp("b").forall(_._4 == 1.0) && byGrp("a").forall(_._4 == 0.375))
    // JVM replay of the md5 floor-threshold draw for group a
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val thr = ("0" * 8 + java.lang.Long.toHexString(
      math.floor(0.375 * 4294967296.0).toLong)).takeRight(8)
    val expA = (0L until 10L).filter(id => md5hex(s"budget:$id") < thr).toSet
    assert(byGrp.get("a").map(_.map(_._1).toSet).getOrElse(Set.empty) == expA)
    // n_toks reports the whitespace token count of each kept doc
    assert(got.forall(t => t._3 == (if (t._2 == "a") 8 else 5)))
  }

  test("winsorize clips to the exact quantile band and flags verdicts") {
    // values 1..20: p10 interpolates to 2.9, p90 to 18.1
    val rows = (1 to 20).map(i =>
      (i.toLong, 1L, ts(i * 1000000L), "a", java.lang.Double.valueOf(i.toDouble)))
    val got = Analytics.winsorize(evDf(rows), col("value"),
      pLow = 0.10, pHigh = 0.90, outCols = Seq("event_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getString(3)))).toMap
    assert(got(1L) == ((1.0, 2.9, "low")) && got(2L) == ((2.0, 2.9, "low")))
    assert(got(3L) == ((3.0, 3.0, "in")) && got(18L) == ((18.0, 18.0, "in")))
    assert(got(19L) == ((19.0, 18.1, "high")) &&
      got(20L) == ((20.0, 18.1, "high")))
  }

  test("assocRules computes support/confidence/lift on hand-built baskets") {
    import spark.implicits._
    // baskets: b1{x,y} b2{x,y} b3{x} b4{y,z} b5{z}; duplicate rows in a
    // basket must not inflate counts
    val rows = Seq("b1" -> "x", "b1" -> "y", "b1" -> "x", "b2" -> "x",
      "b2" -> "y", "b3" -> "x", "b4" -> "y", "b4" -> "z", "b5" -> "z")
    val got = Analytics.assocRules(rows.toDF("b", "i"), "b", "i",
        minPairCount = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // n=5 baskets; items x:3 y:3 z:2; pairs (x,y):2 (y,z):1
    assert(got(("x", "y")) == ((2L, 0.4, 0.666667, 1.111111)))
    assert(got(("y", "x")) == ((2L, 0.4, 0.666667, 1.111111)))
    assert(got(("y", "z")) == ((1L, 0.2, 0.333333, 0.833333)))
    assert(got(("z", "y")) == ((1L, 0.2, 0.5, 0.833333)))
    assert(got.size == 4)
    // the support floor prunes the (y,z) pair, both directions
    val floored = Analytics.assocRules(rows.toDF("b", "i"), "b", "i",
      minPairCount = 2).collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("x", "y"), ("y", "x")))
  }

  test("timeToConversion: pre-signup purchases ignored, ties convert at 0") {
    val rows = Seq(
      // user 1: purchase BEFORE signup ignored; next purchase counts
      (1L, 1L, ts(5000000L), "purchase", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(10000000L), "signup", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(20000000L), "purchase", java.lang.Double.valueOf(1.0)),
      // user 2: signed up, never converted
      (4L, 2L, ts(10000000L), "signup", java.lang.Double.valueOf(1.0)),
      // user 3: purchase only — no signup, absent from output
      (5L, 3L, ts(10000000L), "purchase", java.lang.Double.valueOf(1.0)),
      // user 4: purchase at the exact signup instant converts at 0
      (6L, 4L, ts(30000000L), "signup", java.lang.Double.valueOf(1.0)),
      (7L, 4L, ts(50000000L), "signup", java.lang.Double.valueOf(1.0)),
      (8L, 4L, ts(30000000L), "purchase", java.lang.Double.valueOf(1.0)))
    val got = Analytics.timeToConversion(evDf(rows), "user_id", "ts",
        "event_type", "signup", "purchase")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(1L -> Some(10000000L), 2L -> None, 4L -> Some(0L)))
  }

  test("slidingDistinct fans each event into win/slide windows, counts distinct") {
    val rows = Seq(
      (1L, 1L, ts(10000000L), "a", java.lang.Double.valueOf(1.0)),
      (2L, 2L, ts(12500000L), "a", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(13200000L), "a", java.lang.Double.valueOf(1.0)))
    val got = Analytics.slidingDistinct(evDf(rows), "ts", "user_id",
        windowDur = "4 seconds", slideDur = "1 second")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // u1@10s -> starts 7..10; u2@12.5s -> 9..12; u1@13.2s -> 10..13
    assert(got == Map(
      7000000L -> 1L, 8000000L -> 1L, 9000000L -> 2L, 10000000L -> 2L,
      11000000L -> 2L, 12000000L -> 2L, 13000000L -> 1L))
  }

  test("madOutliers flags the planted spike, never constant/singleton groups") {
    val spiky = Seq(9.0, 9.5, 9.8, 10.0, 10.0, 10.2, 10.5, 11.0, 100.0)
    val rows =
      spiky.zipWithIndex.map { case (v, i) =>
        (i.toLong, 1L, ts(i * 1000000L), "n", java.lang.Double.valueOf(v)) } ++
      // constant group: MAD 0 -> must flag nothing
      Seq.fill(5)(5.0).zipWithIndex.map { case (v, i) =>
        (100L + i, 1L, ts(i * 1000000L), "c", java.lang.Double.valueOf(v)) } :+
      // singleton group: MAD 0 -> must flag nothing
      ((200L, 1L, ts(0), "s", java.lang.Double.valueOf(42.0)))
    val got = Analytics.madOutliers(evDf(rows), "event_type", "value",
        minScore = 3.5, outCols = Seq("event_id", "event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // median 10, MAD 0.5: only the 100.0 scores 0.6745*90/0.5 = 121.41
    assert(got.toSeq == Seq((8L, "n", 121.41)))
  }

  test("lastTouchAttribution: window cutoff, direct, and same-ts tie rule") {
    val S = 1000000L // 1s in micros
    val rows = Seq(
      // u1: click 100s before purchase -> click
      (1L, 1L, ts(1000 * S), "click", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(1100 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u2: view 200000s (>24h) before purchase -> direct
      (3L, 2L, ts(1000 * S), "view", java.lang.Double.valueOf(1.0)),
      (4L, 2L, ts(201000 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u3: purchase with no touch at all -> direct
      (5L, 3L, ts(500 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u4: click then view -> the LAST touch (view) gets the credit
      (6L, 4L, ts(100 * S), "click", java.lang.Double.valueOf(1.0)),
      (7L, 4L, ts(200 * S), "view", java.lang.Double.valueOf(1.0)),
      (8L, 4L, ts(300 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u5: click and view at the SAME ts -> higher event_id (view) wins
      (9L, 5L, ts(400 * S), "click", java.lang.Double.valueOf(1.0)),
      (10L, 5L, ts(400 * S), "view", java.lang.Double.valueOf(1.0)),
      (11L, 5L, ts(500 * S), "purchase", java.lang.Double.valueOf(1.0)))
    val got = Analytics.lastTouchAttribution(evDf(rows), "user_id", "ts",
        "event_id", "event_type", "purchase",
        Seq("click", "view", "signup"), windowSec = 86400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("click" -> ((1L, 0.2)), "view" -> ((2L, 0.4)),
      "direct" -> ((2L, 0.4))))
  }

  test("cohortLtv: epoch-week cohorts, pre-signup excluded, cum exact") {
    val D = 86400L * 1000000L // one day in micros
    val jan1 = 19723L // epoch day of 2024-01-01; 19723/7 = 2817
    def at(day: Long) = ts(day * D)
    val rows = Seq(
      // u1 signs up Jan 1; a pre-signup purchase must be excluded
      (1L, 1L, at(jan1 - 1), "purchase", java.lang.Double.valueOf(99.0)),
      (2L, 1L, at(jan1), "signup", java.lang.Double.valueOf(1.0)),
      (3L, 1L, at(jan1), "purchase", java.lang.Double.valueOf(10.0)),
      (4L, 1L, at(jan1 + 8), "purchase", java.lang.Double.valueOf(5.0)),
      // u2: next day, SAME epoch-week cohort (19724/7 = 2817)
      (5L, 2L, at(jan1 + 1), "signup", java.lang.Double.valueOf(1.0)),
      (6L, 2L, at(jan1 + 2), "purchase", java.lang.Double.valueOf(2.0)),
      // u3: purchase with no signup -> never cohorted
      (7L, 3L, at(jan1), "purchase", java.lang.Double.valueOf(7.0)))
    val got = Analytics.cohortLtv(evDf(rows), "user_id", "ts",
        "event_type", "signup", "purchase", "value")
      .orderBy("weeks_since").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (2817L, 0L, 2L, 12.0, 12.0, 6.0),
      (2817L, 1L, 2L, 5.0, 17.0, 8.5)))
  }

  test("linearAttribution splits credit equally, totals conversions") {
    val S = 1000000L
    val rows = Seq(
      // u1: click + view share the purchase 0.5 / 0.5
      (1L, 1L, ts(100 * S), "click", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(200 * S), "view", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(300 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u2: no touches -> direct 1.0
      (4L, 2L, ts(100 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u3: one view feeds BOTH purchases (both within window)
      (5L, 3L, ts(100 * S), "view", java.lang.Double.valueOf(1.0)),
      (6L, 3L, ts(200 * S), "purchase", java.lang.Double.valueOf(1.0)),
      (7L, 3L, ts(300 * S), "purchase", java.lang.Double.valueOf(1.0)))
    val got = Analytics.linearAttribution(evDf(rows), "user_id", "ts",
        "event_id", "event_type", "purchase",
        Seq("click", "view", "signup"), windowSec = 86400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("click" -> ((1L, 0.5)), "view" -> ((3L, 2.5)),
      "direct" -> ((1L, 1.0))))
    // linear attribution conserves mass: credits sum to conversions
    assert(got.values.map(_._2).sum == 4.0)
  }

  test("positionAttribution: 40/20/40 ends, pair split, singleton, direct") {
    val S = 1000000L
    val rows = Seq(
      // u1: 4 touches -> first click 0.4, middles view/click 0.1, last signup 0.4
      (1L, 1L, ts(100 * S), "click", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(200 * S), "view", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(300 * S), "click", java.lang.Double.valueOf(1.0)),
      (4L, 1L, ts(400 * S), "signup", java.lang.Double.valueOf(1.0)),
      (5L, 1L, ts(500 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u2: 2 touches -> 0.5 each
      (6L, 2L, ts(100 * S), "click", java.lang.Double.valueOf(1.0)),
      (7L, 2L, ts(200 * S), "view", java.lang.Double.valueOf(1.0)),
      (8L, 2L, ts(300 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u3: 1 touch -> full credit
      (9L, 3L, ts(100 * S), "view", java.lang.Double.valueOf(1.0)),
      (10L, 3L, ts(200 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u4: no touch -> direct
      (11L, 4L, ts(100 * S), "purchase", java.lang.Double.valueOf(1.0)))
    val got = Analytics.positionAttribution(evDf(rows), "user_id", "ts",
        "event_id", "event_type", "purchase",
        Seq("click", "view", "signup"), windowSec = 86400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("click" -> ((3L, 1.0)), "view" -> ((3L, 1.6)),
      "signup" -> ((1L, 0.4)), "direct" -> ((1L, 1.0))))
    // mass conservation: credits sum to the 4 conversions
    assert(math.abs(got.values.map(_._2).sum - 4.0) < 1e-9)
  }

  test("timeDecayAttribution: dyadic half-life weights, window, direct") {
    val S = 1000000L
    val rows = Seq(
      // u1: clicks at dt=250,201 (w=0.25 each), view at dt=100 (w=0.5)
      //  -> tot=1.0: click 0.5, view 0.5
      (1L, 1L, ts(0 * S), "click", java.lang.Double.valueOf(1.0)),
      (2L, 1L, ts(49 * S), "click", java.lang.Double.valueOf(1.0)),
      (3L, 1L, ts(150 * S), "view", java.lang.Double.valueOf(1.0)),
      (4L, 1L, ts(250 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u2: no touch -> direct
      (5L, 2L, ts(100 * S), "purchase", java.lang.Double.valueOf(1.0)),
      // u3: only touch is outside the window -> direct
      (6L, 3L, ts(0 * S), "view", java.lang.Double.valueOf(1.0)),
      (7L, 3L, ts(990 * S), "purchase", java.lang.Double.valueOf(1.0)))
    val got = Analytics.timeDecayAttribution(evDf(rows), "user_id", "ts",
        "event_id", "event_type", "purchase",
        Seq("click", "view", "signup"), windowSec = 900L,
        halfLifeSec = 100L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("click" -> ((2L, 0.5)), "view" -> ((1L, 0.5)),
      "direct" -> ((2L, 2.0))))
  }

  test("chainEntropyRate: deterministic chain rate 0, memoryless gain 0") {
    // ABABABA: every transition is determined -> rate 0; marginal
    // next-event entropy is 1 bit -> info_gain 1
    val det = "ABABABA".zipWithIndex.map { case (c, i) =>
      (i.toLong, 1L, ts(i * 1000000L), c.toString,
        java.lang.Double.valueOf(1.0))
    }
    val r1 = Analytics.chainEntropyRate(evDf(det), "user_id", "ts",
        "event_id", "event_type").collect()
    assert(r1.forall(_.getDouble(2) == 0.0))
    assert(r1.head.getDouble(3) == 0.0 && r1.head.getDouble(4) == 1.0 &&
      r1.head.getDouble(5) == 1.0)
    // AABBA: all four transitions equally likely -> rate = marginal = 1
    val mem = "AABBA".zipWithIndex.map { case (c, i) =>
      (i.toLong, 1L, ts(i * 1000000L), c.toString,
        java.lang.Double.valueOf(1.0))
    }
    val r2 = Analytics.chainEntropyRate(evDf(mem), "user_id", "ts",
        "event_id", "event_type").collect()
    assert(r2.head.getDouble(3) == 1.0 && r2.head.getDouble(4) == 1.0 &&
      r2.head.getDouble(5) == 0.0)
  }

  test("markovStationary converges to the analytic two-state fixpoint") {
    // one user, sequence A A B B B B A: P(A->A)=P(A->B)=0.5,
    // P(B->B)=0.75, P(B->A)=0.25 -> stationary (1/3, 2/3); second
    // eigenvalue 0.25, so 12 iterations sit far below the 6dp grain
    val rows = "AABBBBA".zipWithIndex.map { case (c, i) =>
      (i.toLong, 1L, ts(i * 1000000L), c.toString,
        java.lang.Double.valueOf(1.0))
    }
    val got = Analytics.markovStationary(evDf(rows), "user_id", "ts",
        "event_id", "event_type", iters = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("A") - 1.0 / 3) < 5e-6, s"piA = ${got("A")}")
    assert(math.abs(got("B") - 2.0 / 3) < 5e-6, s"piB = ${got("B")}")
    assert(math.abs(got("A") + got("B") - 1.0) < 2e-6)
  }
}

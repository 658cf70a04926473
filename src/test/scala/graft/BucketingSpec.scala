package graft

import graft.data.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  import SparkSuite._

  test("bucketed join and aggregation run without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bucketed",
      "l_orderkey", 8)

    val lb = Bucketing.read(spark, "li_bucketed")
    val ob = Bucketing.read(spark, "o_bucketed")
    // force SMJ so the test asserts the bucket layout, not a broadcast
    val joined = lb.hint("merge").join(ob.hint("merge"), Seq("l_orderkey"))
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString.take(2000))
    // bucketed groupBy on the bucket key needs no exchange either
    val agg = lb.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
    assert(Bucketing.isShuffleFree(agg),
      agg.queryExecution.executedPlan.toString.take(2000))
    // and results match the unbucketed plans
    assert(joined.count() ==
      li.join(o, li("l_orderkey") === o("o_orderkey")).count())
  }

  test("AQE re-plans a shuffle join to broadcast once runtime stats arrive") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    // a filter that leaves a handful of orders: static planning can't
    // know that (stats are per-file), runtime stats can
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000).select("o_orderkey")
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .agg(sum(col("l_quantity")))
    joined.collect() // finalize the adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan.take(500))
    assert(plan.contains("BroadcastHashJoin"),
      "expected runtime broadcast, got:\n" + plan.take(2000))
  }

  test("partitioned write prunes partitions at the source, not post-scan") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val read = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory-level
    // pruning), NOT as a row-level data filter after a full scan
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), plan.take(2000))
    // and the pruned read agrees with the unpartitioned truth
    val truth = Tables.documents(spark, dir).filter(col("lang") === "en")
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(read.agg(sum(col("n_chars"))).head.getLong(0) == truth)
  }

  test("shard writer produces disjoint, internally-sorted range shards") {
    import graft.data.ShardWriter
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    ShardWriter.writeShards(docs, "doc_id", numShards = 4, out)

    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 4, s"expected 4 shards, got ${parts.length}")
    // each shard is internally sorted; shard key ranges are disjoint
    val ranges = parts.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: $hi >= $lo")
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("saltedJoin is row-for-row identical to the plain equi-join") {
    import spark.implicits._
    // hot key 1 on both sides (4x3 fan-out), a 1:1 key, an unmatched
    // key, and a null key (must match nothing in BOTH forms)
    val big = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (2L, "e"),
      (3L, "f")).toDF("k", "bv")
      .union(Seq((Option.empty[Long], "g")).toDF("k", "bv"))
    val small = Seq((1L, 10), (1L, 11), (1L, 12), (2L, 20), (9L, 90))
      .toDF("k", "sv")
      .union(Seq((Option.empty[Long], 99)).toDF("k", "sv"))
    val plain = big.join(small, "k")
      .select("k", "bv", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val salted = graft.ops.SkewJoin.saltedJoin(big, small, "k", salts = 4)
      .select("k", "bv", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
    assert(plain.values.sum == 13, "4*3 hot fan-out + the 1:1 pair")
  }
}

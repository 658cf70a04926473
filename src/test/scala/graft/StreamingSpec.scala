package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkSuite._

  test("streaming hourly window agg equals the batch plan on the same input") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, dir)
      .select("ts", "event_type", "value")
    val expected = StreamOps.hourlyAgg(batchEvents, withWatermark = false)
      .collect().map(_.toSeq).toSet

    // drive the same parquet through a real streaming query
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(tmp)
    val q = StreamOps.hourlyAgg(stream, withWatermark = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_out")
      .start()
    q.processAllAvailable()
    // append mode emits only windows closed by the watermark; a final
    // empty batch advances it past the max event time
    q.stop()
    val got = spark.table("graft_stream_out").collect().map(_.toSeq).toSet
    // watermark semantics: emitted rows must be a subset of the batch
    // result, and cover all but the last (still-open) hour
    assert(got.subsetOf(expected))
    assert(got.size >= expected.size - TextishSlack(expected.size))
  }

  private def TextishSlack(n: Int): Int = math.max(2, n / 10)

  test("streaming dedup emits one row per key") {
    import graft.streaming.StreamOps
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir).select("ts", "event_type", "user_id")
    val expected = ev.select("event_type").distinct().count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    ev.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
    val q = StreamOps.streamingDedup(stream, Seq("event_type"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_out")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_dedup_out").count() == expected)
  }

  test("stateful streaming sessionization matches the batch window plan") {
    import graft.streaming.StreamOps
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir).select("user_id", "ts", "value")
    val batch = StreamOps.sessionizeBatch(ev, gapMinutes = 30)
      .collect().map(_.toSeq).toSet

    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    ev.write.mode("overwrite").parquet(tmp)
    import spark.implicits._
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .as[StreamOps.UserEvent]
    val q = StreamOps.sessionizeStream(stream, gapMinutes = 30)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_sessions").collect().map(_.toSeq).toSet
    // append mode: only watermark-closed sessions are emitted; they must
    // all be real sessions of the batch result, and most sessions close
    assert(got.subsetOf(batch),
      s"streaming emitted non-batch sessions: ${(got -- batch).take(3)}")
    assert(got.size >= (batch.size * 6) / 10,
      s"only ${got.size} of ${batch.size} sessions closed")
  }
}

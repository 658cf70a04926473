package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Guards BOTH events fixture schemas forever (the round-6 regression
  * class): the driver's events.parquet has shipped as parquet
  * TIMESTAMP(NANOS) in some generations and TIMESTAMP(MICROS) in
  * others, and `Tables.events` must load either to identical rows.
  * The two committed fixtures (src/test/resources/graft/events_
  * {micros,nanos}.parquet) hold the same three logical rows — micros
  * written as timestamp[us], nanos as raw parquet TIMESTAMP(NANOS)
  * with the arrow schema stripped so Spark sees the physical type —
  * exercising both branches of `Tables.scala`'s dispatch, including
  * the exact `div 1000` (not double-divide) nanos path.
  */
class TablesSpec extends AnyFunSuite {
  import SparkSuite._

  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory(s"graft-ev-$name")
    val in = getClass.getResourceAsStream(s"/graft/events_$name.parquet")
    assert(in != null, s"missing test resource events_$name.parquet")
    try Files.copy(in, dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    dir.toString
  }

  test("Tables.events loads micros and nanos fixtures to identical rows") {
    val micros = Tables.events(spark, fixtureDir("micros"))
      .orderBy("event_id").collect()
    val nanos = Tables.events(spark, fixtureDir("nanos"))
      .orderBy("event_id").collect()
    assert(micros.length == 3 && nanos.length == 3)
    // both paths must land on a true TIMESTAMP ts column
    assert(micros.head.schema("ts").dataType.typeName == "timestamp")
    assert(nanos.head.schema("ts").dataType.typeName == "timestamp")
    micros.zip(nanos).foreach { case (m, n) => assert(m == n, s"$m != $n") }
    // microsecond precision survives exactly (the div-1000 exactness
    // the r6 oracle mismatch hinged on): 23:59:59.999999 stays .999999
    val t2 = micros(1).getTimestamp(micros(1).fieldIndex("ts"))
    assert(t2.toString == "2024-01-02 23:59:59.999999")
  }
}

package graft.tools

import graft.{Sessions, SparkEntry}

import scala.util.control.NonFatal

/** Scale-rehearsal runner: execute a named subset of the registry
  * against a (possibly partial) testdata dir in ONE JVM, `--reps` times
  * each, releasing operator-scoped caches between runs, and print
  * per-query times plus the min. Unlike [[graft.Bench]] it does not run
  * the whole registry — rehearsal dirs may carry only the tables the
  * family under test reads (see `ScaleUp --tables`), and deliberate
  * exact-quadratic baselines must be excludable at factors where they
  * are designed to be impossible.
  *
  * Usage: runMain graft.tools.Rehearse <sfDir> <q1,q2,...> [--reps n]
  */
object Rehearse {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Rehearse <sfDir> <q1,q2,...> [--reps n]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }
      .getOrElse(2)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.builder(
      graft.Env.cpus(default = 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val n =
          try graft.Materialize(SparkEntry.queries(name)(spark, dir))
          catch { case NonFatal(e) =>
            System.err.println(s"[rehearse] $name failed: ${e.getMessage}")
            -1L
          }
        graft.data.ScopedCaches.releaseAll()
        spark.catalog.clearCache()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[rehearse] $name rep $r: $n rows in $sec%.2f s")
        sec
      }
      println(f"[rehearse] $name MIN ${times.min}%.2f s over $reps reps")
    }
    spark.stop()
  }
}

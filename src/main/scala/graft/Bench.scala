package graft

import scala.util.control.NonFatal

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query and
  * total wall seconds (the driver's BENCH_r{N}.json input).
  *
  * The registry is executed `--reps N` times (or
  * `SPARK_GRAFT_BENCH_REPS`, default 3) inside one JVM, with the Spark
  * cache cleared between reps so every rep is an equally cold run (JVM
  * and codegen stay warm — that is the point). The published per-query
  * number is the MINIMUM across reps: host-level noisy-neighbor
  * contention is one-sided (it only ever adds time), so the minimum is
  * the best estimate of the plan's true cost, and a single contended
  * rep can no longer misgrade the round. Per-rep totals are kept in the
  * same JSON line so the noise itself stays observable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.trim.toInt))
      .getOrElse(3)
      .max(1)
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the measured window
    try Materialize(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case NonFatal(_) => () }

    val names = SparkEntry.registry.map(_.name)
    val perRep: Seq[Map[String, Double]] = (1 to reps).map { rep =>
      // Each rep starts from the same cache state: operator-scoped
      // caches are released through their owner registry, and remaining
      // cross-query caches (deliberately shared within a rep — the
      // decomposition group reuses its deduped relations) are dropped
      // wholesale.
      if (rep > 1) {
        graft.data.ScopedCaches.releaseAll()
        spark.catalog.clearCache()
      }
      SparkEntry.registry.map { q =>
        val t0 = System.nanoTime()
        // Materialize, not count(): count()'s re-optimized plan prunes
        // scan-side projections and join-back shapes to a bare row-count
        // scan, silently under-measuring those queries (see Materialize).
        try Materialize(q.fn(spark, sfDir))
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val mins = names.map(n => n -> perRep.map(_(n)).min)
    val qs = mins.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val repTotals = perRep.map(_.values.sum).mkString("[", ",", "]")
    // entropy-engine job counts per mining query (reference telemetry,
    // MinimalJDGenerator.java:970-979): a batching regression shows up
    // here long before it shows up in sf0.1 seconds
    val tel = graft.queries.MiningQueries.telemetry.toSeq.sortBy(_._1)
      .map { case (k, (jobs, hits)) =>
        s""""$k":{"entropy_jobs":$jobs,"memo_hits":$hits}"""
      }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"rep_totals":$repTotals,"queries":$qs,"telemetry":$tel,"sf":"$sfDir"}""")
    spark.stop()
  }
}

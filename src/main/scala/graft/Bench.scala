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
  /** Splits the per-rep timings into (failed names, min-across-reps for
    * the rest). A query is failed if it threw (recorded as NaN) in ANY
    * rep: a flaky pass must not launder the failure out of the artifact
    * via min(), and a failed query must not get a time at all — the
    * ~0.05 s cost of throwing is indistinguishable from a real speedup
    * in the published JSON (this masked a 22-query regression in
    * round 6).
    */
  private[graft] def summarize(names: Seq[String],
      perRep: Seq[Map[String, Double]]): (Seq[String], Seq[(String, Double)]) = {
    val failed = names.filter(n => perRep.exists(m => m(n).isNaN))
    val okNames = names.filterNot(failed.contains)
    (failed, okNames.map(n => n -> perRep.map(_(n)).min))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Env.cpus(default = 32)
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.trim.toInt))
      .getOrElse(3)
      .max(1)
    // dev-only name filter (comma-separated): time a subset without
    // paying for the whole registry. The driver never sets it.
    val only = args.sliding(2).collectFirst { case Array("--only", n) => n }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
      .map(_.split(",").map(_.trim).toSet)
    val spark = Sessions.builder(cpus).getOrCreate()
    // ERROR, not WARN: the driver captures only the last ~2 KB of
    // stdout/stderr, and a burst of WindowExec WARNs racing the final
    // summary JSON for that window is how the bench channel stays
    // parseable only by luck. Verify's PlanAudit main already does this.
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warmup outside the measured window
    try Materialize(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case NonFatal(_) => () }

    val registry = SparkEntry.registry
      .filter(q => only.forall(_.contains(q.name)))
    val names = registry.map(_.name)
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
      registry.map { q =>
        val t0 = System.nanoTime()
        // Materialize, not count(): count()'s re-optimized plan prunes
        // scan-side projections and join-back shapes to a bare row-count
        // scan, silently under-measuring those queries (see Materialize).
        val ok =
          try { Materialize(q.fn(spark, sfDir)); true }
          catch { case NonFatal(e) =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
          }
        // A failed query must NOT get a time: the cost of throwing an
        // AnalysisException (~0.05 s) is indistinguishable from a real
        // speedup in the published JSON (this masked a 22-query
        // regression in round 6). NaN here → excluded from minima below.
        q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
      }.toMap
    }
    val (failed, mins) = summarize(names, perRep)
    val qs = mins.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val repTotals = perRep
      .map(_.values.filterNot(_.isNaN).sum).mkString("[", ",", "]")
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    // entropy-engine job counts per mining query (reference telemetry,
    // MinimalJDGenerator.java:970-979): a batching regression shows up
    // here long before it shows up in sf0.1 seconds
    val tel = graft.queries.MiningQueries.telemetry.toSeq.sortBy(_._1)
      .map { case (k, (jobs, hits)) =>
        s""""$k":{"entropy_jobs":$jobs,"memo_hits":$hits}"""
      }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"rep_totals":$repTotals,"failed":$failedJson,"queries":$qs,"telemetry":$tel,"sf":"$sfDir"}"""
    // The driver's bench channel captures only the TAIL of stdout
    // (~2 KB), so the FINAL printed line must be short: nine rounds of
    // "parsed": null came first from sbt's [success] epilogue (fixed in
    // build.sbt round 9: StdoutOutput + showSuccess := false) and then
    // from this line itself — the full per-query map is ~10 KB for 300+
    // queries, so any tail capture saw a truncated JSON object. The
    // per-query map and telemetry therefore live ONLY in the mirror
    // file (SPARK_GRAFT_BENCH_OUT, default bench_last.json — the file
    // committed as BENCH_r{N}_campaign/sf1.json), and stdout ends with
    // a ~200-char summary: metric, value, reps, rep totals, failures,
    // query count, and where the detail went.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      full + "\n")
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    val short = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"rep_totals":$repTotals,"failed":$failedJson,"n_queries":${mins.size},"sf":"$sfDir","detail":"$outFile"}"""
    spark.stop()
    println(short)
  }
}

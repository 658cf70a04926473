package graft.tools

import graft.{Sessions, SparkEntry}

/** Run one registered query against a testdata dir and print timing and
  * row count; `--save <path>` writes the result parquet for offline
  * comparison (e.g. recall of an approximate query vs its exact
  * baseline).
  *
  * Usage: runMain graft.tools.RunQuery <queryName> <sfDir> [--save p] [--reps n]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [--save p] [--reps n]")
    val (name, dir) = (args(0), args(1))
    val save = args.sliding(2).collectFirst { case Array("--save", p) => p }
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }.getOrElse(1)
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Sessions.builder(
      graft.Env.cpus(default = 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.Materialize(q(spark, dir))
      println(f"[runquery] $name rep $r: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    save.foreach { p =>
      q(spark, dir).write.mode("overwrite").parquet(p)
      println(s"[runquery] saved -> $p")
    }
    spark.stop()
  }
}

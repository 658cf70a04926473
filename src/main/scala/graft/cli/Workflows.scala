package graft.cli

import graft.Sessions
import graft.core.AttrSet
import graft.data.Ingest
import graft.decompose.{Decomposer, DecompositionService}
import graft.entropy.EntropyEngine
import graft.mine.{JdMiner, MvdMiner}
import graft.schema.SchemaEnumerator
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.File
import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/** The reference's three entry-point workflows (SURVEY.md §3), rebuilt
  * on the Spark engine with the same report columns, `.sep` interchange
  * format, per-run timeouts, and cooperative cancellation
  * (`cancelJobGroup` + a stop flag replacing the volatile STOP of
  * `search/MinimalJDGenerator.java:90` in /root/reference).
  */
object Workflows {

  def defaultThresholds: Seq[Double] = Seq(0.0, 0.1, 0.15, 0.2, 0.25, 0.3,
    0.35, 0.4, 0.5, 0.6, 0.7, 0.75, 0.8, 0.9, 1.0, 1.1, 1.15, 1.3, 1.4,
    1.5, 1.6, 2.0, 2.5, 3.0)

  private[cli] def arg(args: Array[String], key: String, default: String): String =
    args.sliding(2).collectFirst { case Array(`key`, v) => v }.getOrElse(default)

  /** getOrCreate plus ownership: only stop the session if this workflow
    * created it (embedding callers — tests, notebooks — keep theirs).
    */
  private[cli] def session(): (SparkSession, Boolean) = {
    val existed = SparkSession.getDefaultSession.nonEmpty
    val s = Sessions.builder(graft.Env.cpus(default = 8))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (s, !existed)
  }

  /** CSV file -> the engine's canonical encoded relation; parquet file ->
    * all columns stringified. Cached.
    */
  private[cli] def loadRelation(spark: SparkSession, input: String,
                                header: Boolean): DataFrame = {
    val raw =
      if (input.endsWith(".parquet")) {
        val df = spark.read.parquet(input)
        Ingest.relationOf(df, df.columns.toSeq)
      } else Ingest.readCsv(spark, input, header)
    Ingest.encode(raw).cache()
  }

  /** Run `body` on a worker thread inside a named Spark job group with a
    * wall-clock timeout; on timeout, sets the cooperative stop flag and
    * cancels the group's Spark jobs. Returns None on timeout.
    */
  private[cli] def withTimeout[T](spark: SparkSession, seconds: Long,
                                  group: String, stop: AtomicBoolean)
                                 (body: => T): Option[T] = {
    val pool = Executors.newSingleThreadExecutor()
    val fut = pool.submit(new java.util.concurrent.Callable[T] {
      override def call(): T = {
        spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
      }
    })
    try Some(fut.get(seconds, TimeUnit.SECONDS))
    catch {
      case _: TimeoutException =>
        stop.set(true)
        spark.sparkContext.cancelJobGroup(group)
        fut.cancel(true)
        None
    } finally pool.shutdown()
  }
}

/** Workflow 1 (`Main.main`, SURVEY §3.1): mine approximate MVDs across a
  * threshold sweep, with the reference's report columns. Two modes:
  *
  * Single relation:
  *   runMain graft.cli.MineMvds --input <csv|parquet> [--header true]
  *     [--thresholds 0.1,0.5] [--timeout 12000] [--report out/mining.csv]
  *
  * Directory batch sweep (the reference's main experiment harness,
  * `Main.java:202-221` in /root/reference: every input file in the
  * directory, smallest file first, the full threshold sweep per file,
  * one `<name>.out.csv` report per input in the output directory):
  *   runMain graft.cli.MineMvds --inputDir <dir> [--out reports/mining]
  *     [--header true] [--thresholds ...] [--timeout 12000]
  */
object MineMvds {
  import Workflows._

  def main(args: Array[String]): Unit = {
    val inputDir = arg(args, "--inputDir", "")
    val (spark, ownSession) = session()
    val header = arg(args, "--header", "true").toBoolean
    val thresholds = arg(args, "--thresholds", "")
      match { case "" => defaultThresholds case s => s.split(",").toSeq.map(_.toDouble) }
    val timeout = arg(args, "--timeout", "12000").toLong
    if (inputDir.nonEmpty) {
      val outDir = arg(args, "--out", "reports/mining")
      val files = Option(new File(inputDir).listFiles()).getOrElse(Array.empty)
        .filter(f => (f.isFile && f.getName.endsWith(".csv")) ||
          f.getName.endsWith(".parquet"))
        .sortBy(_.length()) // smallest first, as the reference sorts
      for (f <- files) {
        sweep(spark, f.getPath, header, thresholds, timeout,
          s"$outDir/${f.getName}.out.csv")
      }
    } else {
      val input = arg(args, "--input", "/root/testdata/sf0.001/orders.parquet")
      sweep(spark, input, header, thresholds, timeout,
        arg(args, "--report", "reports/mining.csv"))
    }
    if (ownSession) spark.stop()
  }

  /** One relation, full threshold sweep, one report file; a TIMEOUT row
    * marks each threshold the miner couldn't finish inside the budget.
    */
  private def sweep(spark: SparkSession, input: String, header: Boolean,
                    thresholds: Seq[Double], timeout: Long,
                    reportPath: String): Unit = {
    val rel = loadRelation(spark, input, header)
    val eng = new EntropyEngine(rel)
    val report = new CsvReport(reportPath, Reports.MiningHeader)
    for (t <- thresholds) {
      val stop = new AtomicBoolean(false)
      val t0 = System.nanoTime()
      val scans0 = eng.numQueriesIssued
      val mined = withTimeout(spark, timeout, s"mine-mvds-$t", stop) {
        new MvdMiner(eng, t, () => stop.get()).mine()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      mined match {
        case Some(mvds) =>
          mvds.foreach(m => println(m.toString)) // `{i} ->> {j} : m` format
          report.record(Seq(eng.numAttrs, eng.numRows, t, mvds.size,
            eng.numQueriesIssued - scans0, f"$secs%.3f", f"$secs%.3f", 100))
        case None =>
          report.record(Seq(eng.numAttrs, eng.numRows, t, "TIMEOUT",
            eng.numQueriesIssued - scans0, f"$secs%.3f", f"$secs%.3f", 100))
      }
    }
    report.close()
    rel.unpersist() // a batch sweep must not pin every relation in memory
  }
}

/** Workflow 2 (`MinimalJDGenerator.main`, SURVEY §3.2): mine minimal
  * separators and JDs, write `.sep` files + a stats CSV. Usage:
  *   runMain graft.cli.MineSeps --input <csv|parquet> [--thresholds ...]
  *     [--timeout 20] [--out out/jds] [--report out/jdmining.csv]
  */
object MineSeps {
  import Workflows._

  def main(args: Array[String]): Unit = {
    val input = arg(args, "--input", "/root/testdata/sf0.001/orders.parquet")
    val (spark, ownSession) = session()
    val rel = loadRelation(spark, input, arg(args, "--header", "true").toBoolean)
    val eng = new EntropyEngine(rel)
    eng.precomputeMostSpecific()
    val thresholds = arg(args, "--thresholds", "0.1")
      .split(",").toSeq.map(_.toDouble)
    val timeout = arg(args, "--timeout", "20").toLong
    val outDir = arg(args, "--out", "reports/jds")
    val report = new CsvReport(arg(args, "--report", "reports/jdmining.csv"),
      Reports.JdMiningHeader)
    val base = new File(input).getName.replaceAll("\\.(csv|parquet)$", "")
    for (t <- thresholds) {
      val stop = new AtomicBoolean(false)
      val t0 = System.nanoTime()
      val q0 = eng.numQueriesIssued
      val miner = new JdMiner(eng, t, () => stop.get())
      val result = withTimeout(spark, timeout, s"mine-seps-$t", stop) {
        val seps = miner.mineAllMinSeps()
        val jds = miner.mineAllFullJds(limit = 10, seps = Some(seps))
        (seps, jds)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      result match {
        case Some((seps, jds)) =>
          SepFiles.write(s"$outDir/$base.THRESH.$t.sep", eng.numAttrs, jds)
          report.record(Seq(eng.numAttrs, eng.numRows, t, eng.numAttrs,
            timeout, true, seps.size, jds.size, 0,
            eng.numQueriesIssued - q0, f"$secs%.3f", 100,
            eng.cachedEntropies, f"$secs%.3f"))
        case None =>
          report.record(Seq(eng.numAttrs, eng.numRows, t, eng.numAttrs,
            timeout, false, 0, 0, 0, eng.numQueriesIssued - q0,
            f"$secs%.3f", 100, eng.cachedEntropies, f"$secs%.3f"))
      }
    }
    report.close()
    if (ownSession) spark.stop()
  }
}

/** Workflow 3 (`AcyclicSchemaEnumerator.main`, SURVEY §3.3): read `.sep`
  * files, enumerate acyclic schemas, evaluate each decomposition against
  * the data. Usage:
  *   runMain graft.cli.EnumerateSchemas --input <csv|parquet>
  *     --seps <dir> [--limit 20] [--report out/enum.csv]
  */
object EnumerateSchemas {
  import Workflows._

  def main(args: Array[String]): Unit = {
    val input = arg(args, "--input", "/root/testdata/sf0.001/orders.parquet")
    val sepDir = arg(args, "--seps", "reports/jds")
    val limit = arg(args, "--limit", "20").toInt
    val (spark, ownSession) = session()
    val rel = loadRelation(spark, input, arg(args, "--header", "true").toBoolean)
    val dec = new Decomposer(rel)
    val svc = new DecompositionService(spark, dec)
    val report = new CsvReport(arg(args, "--report", "reports/enum.csv"),
      Reports.EnumHeader)
    val files = Option(new File(sepDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".sep"))
      .sortBy(f => SepFiles.thresholdOf(f.getName).getOrElse(Double.MaxValue))
    try {
      for (f <- files) {
        val parsed = SepFiles.read(f.getPath)
        if (parsed.nonEmpty) {
          val n = parsed.head._1
          val jds = parsed.map(_._2).toVector
          val t0 = System.nanoTime()
          var count = 0
          new SchemaEnumerator(n, jds).schemas(limit).foreach { schema =>
            count += 1
            try {
              val info = svc.submitJobSynchronous(schema.tree)
              val elapsed = (System.nanoTime() - t0) / 1e9
              report.record(Seq(
                schema.jds.map(_.measure.value).maxOption.getOrElse(0.0),
                schema.separators.map(_.size).maxOption.getOrElse(0),
                f"$elapsed%.3f", count, info.largestRelation,
                info.clusters.size, info.spurious, info.totalTuples,
                info.totalCells))
            } catch {
              case e: Exception =>
                System.err.println(
                  s"[enumerate] schema ${schema.jds.take(3)}... failed: ${e.getMessage}")
            }
          }
        }
      }
    } finally {
      report.close()
      svc.shutdown()
      if (ownSession) spark.stop()
    }
  }
}

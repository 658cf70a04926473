package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-consistency certificates for the KMeans-adaptive ANN paths
  * ([[Similarity.ivfTopK]], [[Similarity.pqTopK]],
  * [[Similarity.ivfPqTopK]]).
  *
  * The iterative training makes the trained geometry (centroids,
  * codebooks) engine-specific, so the driver's DuckDB oracle cannot
  * replay these queries value-for-value the way it replays the pinned
  * twins — and the oracle only sees the corpus tables, never the Spark
  * output, so the trained geometry cannot be handed to it either. What
  * CAN be hash-gated is a certificate: the query runs the full
  * production pipeline, checks each stage's defining invariant against
  * the geometry the training emitted, and outputs ONLY the
  * deterministic all-BIGINT verdict rows whose expected values DuckDB
  * computes from the corpus alone (every corpus row must certify, every
  * (query, rank) slot must certify, ...). Any training bug, mis-
  * assignment, wrong probe, shortlist cutoff error or ranking error
  * flips a verdict to 0 — or changes the row count — and the gate goes
  * red. The invariants per index stage:
  *
  *  - `centroid_count` / `codebook_shape`: the trained geometry has
  *    exactly the requested shape (k centers, m×ksub codewords);
  *  - `assign_argmin`: every corpus vector's trained cell is an argmin
  *    (within `Tol`) of squared L2 to the EMITTED centroids, recomputed
  *    through the library's own `vec_l2sq` kernel over the normalized
  *    arrays — an independent path from Spark ML's internal
  *    norm-decomposed distance;
  *  - `code_argmin`: every PQ code is a per-subspace argmin (within
  *    `Tol`) over the emitted codebook — also catching out-of-range
  *    codes (no CASE arm matches → verdict 0);
  *  - `probe_nearest`: each of the query's nProbe probed cells is
  *    within `Tol` of the nProbe-th nearest centroid distance
  *    (membership, so exact ties certify either pick);
  *  - `adc_shortlist_valid` / `topk_valid`: a rank-r row has EXACTLY
  *    r−1 strictly-better candidates under the stage's order
  *    ((score desc, id asc)), counted with a join + aggregate — a
  *    mechanism independent of the row_number window that produced the
  *    ranking, and one that also pins the row count (a missing rank
  *    slot changes the output cardinality).
  *
  * The candidate SCORES feeding the rank certificates are the
  * production frames' own values: the kernels that compute them
  * (`cosine_sim`, `pq_adc`, `vec_l2sq`) are hash-gated end-to-end by
  * the pinned twins (`sim_ann_topk_ivf_pinned`, `_ivfpq_pinned`,
  * `_pq_pinned`), so the certificate's job is the part the twins
  * cannot cover — the trained geometry and the stage plumbing around
  * it.
  *
  * Scale shape: the argmin checks are scan-side kernel folds (the
  * pinned twins' exact shape — zero shuffle); the rank certificates
  * join a candidates frame against k·|Q| (or rerank·|Q|) broadcast
  * rows and aggregate — bounded by the production path's own probed
  * candidate stream. The certificate adds no stage asymptotically
  * heavier than the pipeline it certifies.
  */
object AnnCertify {

  /** Absolute slack on squared-L2 argmin membership: distances live in
    * [0, 4] on unit vectors, fp noise is ~1e-15, and a genuinely wrong
    * assignment is separated by the data — 1e-9 accepts any reordering
    * of correct float math and no plausible bug.
    */
  val Tol = 1e-9

  private val OutCols = Seq("cert", "a", "b", "ok")

  private def driverRows(sp: SparkSession,
      rows: Seq[(String, Long, Long, Long)]): DataFrame = {
    import sp.implicits._
    rows.toDF(OutCols: _*)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    // a certificate must fail loudly: silently truncating to the
    // shorter array would let an upstream dimension bug PARTIALLY
    // certify instead of flipping a verdict
    require(a.length == b.length,
      s"certificate dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** (cert, id, 0, ok) per corpus row: the assigned cell's squared L2
    * to the emitted centroid is within [[Tol]] of the minimum, both
    * recomputed from the normalized array via the `vec_l2sq` kernel.
    */
  private def assignArgminCert(assigned: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    // This form expands one literal-array vec_l2sq call per centroid
    // plus a least(...) chain and a numCells-arm CASE — fine at the
    // registered 8/16 cells, but the same literal-expansion shape
    // that blew the janino whole-stage-codegen method budget at
    // m·ksub=128 in the PQ path (→ SILENT interpreted fallback, see
    // pq_code_dist). Bound it hard so growth past the compiled-proven
    // regime is a loud error, not a 10× interpreted slowdown; past 32
    // cells this check needs kernel-izing like pq_code_dist.
    require(centroids.size <= 32,
      s"assignArgminCert literal expansion is codegen-proven only to " +
        s"32 centroids, got ${centroids.size}; kernel-ize first")
    val base = assigned.withColumn("__nv", Similarity.normalized(col("v")))
    val dists = centroids.map { case (cell, c) =>
      (cell, call_function("vec_l2sq", col("__nv"), typedLit(c.toSeq)))
    }
    val mind = dists.map(_._2).reduceLeft(least(_, _))
    val assignedD = dists.tail.foldLeft(
      when(col("cell") === dists.head._1, dists.head._2)) {
      case (acc, (cell, d)) => acc.when(col("cell") === cell, d)
    }
    base.select(lit("assign_argmin").as("cert"),
      col("id").cast("long").as("a"), lit(0L).as("b"),
      when(assignedD.isNotNull && assignedD <= mind + Tol, 1L)
        .otherwise(0L).as("ok"))
  }

  /** (cert, query, probeIdx 1.., ok) per probed cell: driver-side
    * membership check against the nProbe-th nearest centroid distance.
    */
  private def probeNearestCert(sp: SparkSession,
      centroids: Seq[(Int, Array[Double])], probeRows: Seq[(Long, Int)],
      queryVecs: Seq[(Long, Array[Double])], nProbe: Int): DataFrame = {
    val qMap = queryVecs.toMap
    val rows = probeRows.groupBy(_._1).toSeq.flatMap { case (qid, ps) =>
      val dists = centroids.map { case (cell, c) =>
        (cell, sqDist(c, qMap(qid)))
      }.toMap
      val thresh =
        dists.values.toSeq.sorted.apply(math.min(nProbe, dists.size) - 1)
      ps.zipWithIndex.map { case ((_, cell), i) =>
        ("probe_nearest", qid, (i + 1).toLong,
          if (dists.get(cell).exists(_ <= thresh + Tol)) 1L else 0L)
      }
    }
    driverRows(sp, rows)
  }

  /** (cert, query, rank, ok) per emitted row: rank r has exactly r−1
    * strictly-better candidates under (score desc, id asc), counted by
    * join + aggregate. `ranked` must carry (query_id, neighbor_id,
    * rankCol, scoreCol); `candidates` (query_id, idCol, scoreCol).
    */
  private def rankCert(name: String, ranked: DataFrame, rankCol: String,
      scoreCol: String, candidates: DataFrame, candIdCol: String): DataFrame = {
    val t = ranked.select(col("query_id"), col("neighbor_id"),
      col(rankCol).cast("long").as("__r"), col(scoreCol).as("__s"))
    val c = candidates.select(col("query_id").as("__cq"),
      col(candIdCol).as("__ci"), col(scoreCol).as("__cs"))
    t.join(c, col("__cq") === col("query_id") &&
        (col("__cs") > col("__s") ||
          (col("__cs") === col("__s") && col("__ci") < col("neighbor_id"))),
        "left")
      .groupBy(col("query_id"), col("__r"))
      .agg(count(col("__ci")).as("__nb"))
      .select(lit(name).as("cert"), col("query_id").cast("long").as("a"),
        col("__r").as("b"),
        when(col("__nb") === col("__r") - 1L, 1L).otherwise(0L).as("ok"))
  }

  /** Certificate relation for [[Similarity.ivfTopK]] (plain or
    * label-filtered): centroid_count + assign_argmin + probe_nearest +
    * topk_valid. All-BIGINT, deterministic — see the object doc for the
    * matching oracle.
    */
  private[graft] def ivfCertificate(parts: Similarity.IvfParts,
      numCells: Int, nProbe: Int): DataFrame = {
    val sp = parts.assigned.sparkSession
    // the candidate frame feeds BOTH the production ranking inside
    // parts.topk and the rank certificate's better-count join — cache
    // it so the probed-cell scan runs once (the cache manager matches
    // topk's identical subplan structurally)
    val scored = graft.data.ScopedCaches.track(parts.scored)
    val shape = driverRows(sp, Seq(("centroid_count",
      parts.centroids.size.toLong, 0L,
      if (parts.centroids.size == numCells) 1L else 0L)))
    shape
      .unionByName(assignArgminCert(parts.assigned, parts.centroids))
      .unionByName(probeNearestCert(sp, parts.centroids, parts.probeRows,
        parts.queryVecs, nProbe))
      .unionByName(rankCert("topk_valid", parts.topk, "rank", "cosine",
        scored, "neighbor_id"))
  }

  /** Certificate relation for [[Similarity.pqTopK]] /
    * [[Similarity.ivfPqTopK]]: codebook_shape + code_argmin +
    * adc_shortlist_valid + topk_valid, plus the coarse IVF section
    * (centroid_count / assign_argmin / probe_nearest) when the index
    * has one.
    */
  private[graft] def pqCertificate(parts: Similarity.PqParts, m: Int,
      ksub: Int, nProbe: Int, numCells: Option[Int] = None): DataFrame = {
    val sp = parts.coded.sparkSession
    val shapeRows = (0 until m).map { i =>
      val got = parts.codebooks.lift(i).map(_.size.toLong).getOrElse(0L)
      ("codebook_shape", i.toLong, got, if (got == ksub) 1L else 0L)
    } ++ (if (parts.codebooks.size == m) Nil
          else Seq(("codebook_shape", -1L, parts.codebooks.size.toLong, 0L)))
    val shape = driverRows(sp, shapeRows)
    // per (row, subspace): the stored code is an argmin codeword for
    // the row's i-th normalized slice, within Tol. Distances go through
    // `pq_encode` + `pq_code_dist` — one kernel call each per row (the
    // m·ksub literal-array form blew the codegen method budget and fell
    // back to interpreted) and a path independent of the Spark ML
    // transform that produced the codes. Out-of-range codes surface as
    // +Inf and fail the membership check.
    val base = parts.coded.withColumn("__nv", Similarity.normalized(col("v")))
    val cbFlat: Array[Double] = parts.codebooks.flatten.flatten.toArray
    val best = call_function("pq_encode", col("__nv"), typedLit(cbFlat),
      lit(m), lit(ksub))
    val dAssigned = call_function("pq_code_dist", col("__nv"),
      typedLit(cbFlat), col("codes"), lit(ksub))
    val dBest = call_function("pq_code_dist", col("__nv"),
      typedLit(cbFlat), best, lit(ksub))
    val okArr = zip_with(dAssigned, dBest,
      (da, db) => when(da <= db + Tol, 1L).otherwise(0L))
    val codeCert = base
      .select(col("id"), posexplode(okArr).as(Seq("__i", "__ok")))
      .select(lit("code_argmin").as("cert"), col("id").cast("long").as("a"),
        col("__i").cast("long").as("b"), col("__ok").as("ok"))
    val adcCert = rankCert("adc_shortlist_valid",
      parts.shortlist.select(col("query_id"), col("neighbor_id"),
        col("arank"), col("approx")),
      "arank", "approx", parts.approxScored, "id")
    val topkCert = rankCert("topk_valid", parts.topk, "rank", "cosine",
      parts.exactScored, "neighbor_id")
    val pqSection = shape.unionByName(codeCert).unionByName(adcCert)
      .unionByName(topkCert)
    parts.coarse match {
      case None => pqSection
      case Some((centroids, probeRows)) =>
        driverRows(sp, Seq(("centroid_count", centroids.size.toLong, 0L,
            if (numCells.contains(centroids.size)) 1L else 0L)))
          .unionByName(assignArgminCert(parts.coded, centroids))
          .unionByName(probeNearestCert(sp, centroids, probeRows,
            parts.queryVecs, nProbe))
          .unionByName(pqSection)
    }
  }

  // ---- DuckDB oracle forms -------------------------------------------
  //
  // MINIMUM-CORPUS ASSUMPTIONS. The slot oracles hard-code the verdict
  // domain: exactly |Q|·k `topk_valid` slots, |Q|·rerank
  // `adc_shortlist_valid` slots, |Q|·nProbe `probe_nearest` slots. A
  // red gate is therefore a FALSE ALARM (not an engine bug) when the
  // corpus legitimately cannot fill the slots:
  //  - fewer than `rerank` (resp. `k`) candidates reachable in a
  //    query's probed cells → missing shortlist/rank rows;
  //  - fewer than `nProbe` non-empty cells trained → fewer probes.
  // The registered corpora (≥500 vectors, 8/16 cells, nProbe 2-4,
  // rerank ≤ 50) clear these with two orders of margin; diagnose an
  // undersized-pool red by counting rows per (cert, query) before
  // suspecting the pipeline.

  private def valuesOf(queryIds: Seq[Long]): String =
    queryIds.map(q => s"($q)").mkString(", ")

  private def slotSql(cert: String, queryIds: Seq[Long], hi: Int): String =
    s"""SELECT '$cert', CAST(q.qid AS BIGINT), CAST(r.b AS BIGINT),
       |  CAST(1 AS BIGINT)
       |FROM (VALUES ${valuesOf(queryIds)}) q(qid)
       |CROSS JOIN range(1, ${hi + 1}) r(b)""".stripMargin

  /** Oracle for [[ivfCertificate]]: every verdict row is expected ok=1
    * with the exact domain (all corpus rows; |Q|·nProbe probe slots;
    * |Q|·k rank slots) computed from the corpus table alone.
    */
  private[graft] def ivfCertificateSql(queryIds: Seq[Long], numCells: Int,
      nProbe: Int, k: Int): String =
    s"""SELECT 'centroid_count' AS cert, CAST($numCells AS BIGINT) AS a,
       |  CAST(0 AS BIGINT) AS b, CAST(1 AS BIGINT) AS ok
       |UNION ALL
       |SELECT 'assign_argmin', CAST(vec_id AS BIGINT), CAST(0 AS BIGINT),
       |  CAST(1 AS BIGINT) FROM embeddings
       |UNION ALL
       |${slotSql("probe_nearest", queryIds, nProbe)}
       |UNION ALL
       |${slotSql("topk_valid", queryIds, k)}""".stripMargin

  /** Oracle for [[pqCertificate]] without a coarse quantizer. */
  private[graft] def pqCertificateSql(queryIds: Seq[Long], m: Int,
      ksub: Int, rerank: Int, k: Int): String =
    s"""SELECT 'codebook_shape' AS cert, CAST(i AS BIGINT) AS a,
       |  CAST($ksub AS BIGINT) AS b, CAST(1 AS BIGINT) AS ok
       |FROM range(0, $m) t(i)
       |UNION ALL
       |SELECT 'code_argmin', CAST(vec_id AS BIGINT), CAST(i AS BIGINT),
       |  CAST(1 AS BIGINT)
       |FROM embeddings CROSS JOIN range(0, $m) t(i)
       |UNION ALL
       |${slotSql("adc_shortlist_valid", queryIds, rerank)}
       |UNION ALL
       |${slotSql("topk_valid", queryIds, k)}""".stripMargin

  /** Oracle for [[pqCertificate]] with the coarse IVF section. */
  private[graft] def ivfPqCertificateSql(queryIds: Seq[Long], numCells: Int,
      nProbe: Int, m: Int, ksub: Int, rerank: Int, k: Int): String =
    s"""SELECT 'centroid_count' AS cert, CAST($numCells AS BIGINT) AS a,
       |  CAST(0 AS BIGINT) AS b, CAST(1 AS BIGINT) AS ok
       |UNION ALL
       |SELECT 'assign_argmin', CAST(vec_id AS BIGINT), CAST(0 AS BIGINT),
       |  CAST(1 AS BIGINT) FROM embeddings
       |UNION ALL
       |${slotSql("probe_nearest", queryIds, nProbe)}
       |UNION ALL
       |${pqCertificateSql(queryIds, m, ksub, rerank, k)}""".stripMargin
}

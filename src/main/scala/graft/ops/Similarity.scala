package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an embedding column
  * (`array<float>`): cosine near-duplicate pairs, brute-force cosine
  * top-k (the exact baseline), and an LSH-bucketed approximate top-k
  * (the scale path — buckets bound the candidate set so no n^2 shuffle).
  * Dot products are `zip_with` + `aggregate` column expressions —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns (double math),
    * via the codegen'd native expression ([[graft.functions.CosineSimilarity]],
    * registered by [[graft.GraftExtensions]]): one tight primitive loop
    * instead of interpreted zip_with/aggregate lambdas.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** All pairs with cosine >= tau. Exact; the self-join is a broadcast
    * of the smaller side when feasible. For corpora where n^2 is
    * prohibitive use [[lshCosinePairs]].
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  tau: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.toDF("id1", "v1").join(v.toDF("id2", "v2"), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Exact brute-force cosine top-k for a query set (ids in the same
    * table): rank by cosine rounded to 6dp with id tie-break, so results
    * are engine-stable.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** ColBERT-style multi-vector late-interaction (MaxSim) top-k: each
    * embedding is read as `nSub` contiguous sub-vectors of `subDim`
    * dims, and score(q, d) = Σ_i max_j cos(q_i, d_j) — every query
    * sub-vector matches its best document sub-vector independently,
    * the retrieval shape behind late-interaction rankers (token-level
    * multi-vector models served from a single packed array column).
    *
    * All nSub² cosines are codegen'd `slice` + `cosine_sim` columns in
    * ONE pair scan — no explode, no per-sub-vector join; the per-i max
    * is a `greatest` over 6dp-rounded cosines and the score a fixed
    * left-to-right sum of those maxes, so ranking replays bit-for-bit
    * in any engine. Query set broadcast, corpus streams; ranking is the
    * same (score desc, id) window as [[bruteForceTopK]].
    */
  def maxSimTopK(df: DataFrame, idCol: String, vecCol: String,
                 queryPred: Column, subDim: Int, nSub: Int,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(subDim >= 1 && nSub >= 1 && k >= 1, "need positive params")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val score = (0 until nSub).map { i =>
      val qs = slice(col("qv"), i * subDim + 1, subDim)
      val sims = (0 until nSub).map(j =>
        round(cosine(qs, slice(col("v"), j * subDim + 1, subDim)), 6))
      if (sims.size == 1) sims.head else greatest(sims: _*)
    }.reduce(_ + _)
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(score, 6).as("maxsim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "maxsim")
  }

  /** Maximal-Marginal-Relevance diversified rerank: from each query's
    * brute-force top-`m` cosine candidates, greedily select `k` that
    * trade relevance against redundancy —
    * argmax λrel·rel(d) − λdiv·max_{s∈S} cos(d, s) — the classic
    * redundancy-suppressing rerank (Carbonell & Goldstein 1998) every
    * retrieval stack bolts onto its ANN stage. Pass both weights
    * explicitly (never compute 1−λ: the single-literal rule).
    *
    * The greedy loop is inherently sequential in k but BOUNDED (m
    * candidates per query): stage 1 is the usual broadcast pair scan +
    * top-m window; stage 2 computes the m×(m−1) candidate-candidate
    * cosines per query (codegen pair join, never corpus-wide); stage 3
    * packs each query's candidates and sims into arrays and runs the
    * k-step fold as ONE `aggregate` HOF over `sequence(1,k)` — per-row
    * work is O(k·m²) on in-memory arrays, no iteration-scale joins, no
    * driver loop, queries process in parallel. Selection ties break to
    * the smaller id via max-of-(score, −id) structs. Requires m ≥ k.
    *
    * The greedy score is computed in SCALED INTEGERS, not floats:
    * λ-weighting 6dp cosines lands a tenth of all scores EXACTLY on a
    * 7th-decimal half (0.7·x − 0.3·y of 6dp decimals is a 7dp decimal),
    * where Spark's round (shortest-string HALF_UP) and an oracle's
    * binary round disagree — so the weights become integer
    * hundredths and sc = wRel·(10⁶rel) − wDiv·(10⁶ms) ranks as an
    * exact BIGINT in 10⁻⁸ units that any engine reproduces bit-for-bit
    * (the oracle walks the same recursion over the same arrays).
    */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, m: Int, k: Int,
                lambdaRel: Double, lambdaDiv: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    val wRel = math.round(lambdaRel * 100)
    val wDiv = math.round(lambdaDiv * 100)
    require(wRel / 100.0 == lambdaRel && wDiv / 100.0 == lambdaDiv,
      s"weights must be integer hundredths, got $lambdaRel/$lambdaDiv")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(cosine(col("qv"), col("v")), 6).as("rel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("id"))
    val cands = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m).drop("__rn")
    val cv = cands.join(v, "id")
    val c1 = cv.select(col("query_id"), col("id").as("a"), col("v").as("va"))
    val c2 = cv.select(col("query_id").as("__q2"), col("id").as("b"),
      col("v").as("vb"))
    val sims = c1.join(c2,
        col("query_id") === col("__q2") && col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(cosine(col("va"), col("vb")), 6).as("s"))
    val candArr = cands.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("id"),
        round(col("rel") * 1e6, 0).cast("long").as("rs")))).as("cands"))
    val simArr = sims.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("a"), col("b"),
        round(col("s") * 1e6, 0).cast("long").as("ss")))).as("sims"))
    val packed = candArr.join(simArr, Seq("query_id"), "left")
      .withColumn("sims", coalesce(col("sims"),
        expr("CAST(array() AS array<struct<a:bigint,b:bigint,ss:bigint>>)")))
    val init = struct(
      expr("CAST(array() AS array<bigint>)").as("sel"),
      expr("CAST(array() AS array<struct<id:bigint,rank:int,sc:bigint>>)")
        .as("out"))
    val folded = packed.select(col("query_id"),
      aggregate(sequence(lit(1), lit(k)), init,
        (acc: Column, step: Column) => {
        val sel = acc.getField("sel")
        val remaining = filter(col("cands"),
          c => !array_contains(sel, c.getField("id")))
        val stepScores = transform(remaining, c => {
          val ms = array_max(transform(
            filter(col("sims"), p =>
              p.getField("a") === c.getField("id") &&
                array_contains(sel, p.getField("b"))),
            p => p.getField("ss")))
          struct(
            (lit(wRel) * c.getField("rs") -
              lit(wDiv) * coalesce(ms, lit(0L))).as("sc"),
            (-c.getField("id")).as("ni"))
        })
        val best = array_max(stepScores)
        val bestId = -best.getField("ni")
        struct(
          concat(sel, array(bestId)).as("sel"),
          concat(acc.getField("out"), array(struct(
            bestId.as("id"), step.cast("int").as("rank"),
            best.getField("sc").as("sc")))).as("out"))
      }).getField("out").as("o"))
    folded.select(col("query_id"), explode(col("o")).as("e"))
      .select(col("query_id"), col("e.id").as("neighbor_id"),
        col("e.rank").as("rank"),
        (col("e.sc").cast("double") / 1e8).as("score"))
  }

  /** Matryoshka truncation audit: recall@k of brute-force cosine top-k
    * computed on the first `d` dimensions against the full-dimension
    * top-k, for each `d` in `dims` — the measurement behind "can we
    * store 16 of the 64 dims and keep 90% of retrieval?" (matryoshka /
    * dimension-truncation deployment, the cheapest embedding-store
    * compression there is). High recall at small d ⇒ truncate + rerank;
    * low ⇒ the tail dims carry real signal.
    *
    * ONE pair scan computes the full and every truncated similarity
    * (`slice` + the `cosine_sim` kernel, so each variant is one more
    * codegen'd column, not another corpus pass); per-variant top-k are
    * windows over the SAME query_id partitioning (one shuffle, sorts
    * reused), ranked by (6dp cosine desc, neighbor id) so every rank
    * boundary replays. Recall is summed in integers and divided once —
    * sum(hits)/(n·k) — never an average of per-query doubles, so the
    * result is bit-stable under partition order. Queries with zero
    * overlap are kept by a (dim × query) spine. The query set comes
    * from `queryPred` and is broadcast; corpus side streams.
    */
  def matryoshkaRecall(df: DataFrame, idCol: String, vecCol: String,
                       queryPred: Column, k: Int,
                       dims: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims.nonEmpty && k >= 1, "need dims and k >= 1")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(Seq(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("sim_full")) ++
        dims.map(d => round(cosine(slice(col("qv"), 1, d),
          slice(col("v"), 1, d)), 6).as(s"sim_$d")): _*)
    def topK(simCol: String) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(simCol).desc, col("neighbor_id"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).select("query_id", "neighbor_id")
    }
    val full = topK("sim_full")
    val variants = dims.map(d => topK(s"sim_$d")
      .withColumn("trunc_dim", lit(d))).reduce(_ unionByName _)
    val hits = variants.join(full, Seq("query_id", "neighbor_id"))
      .groupBy(col("trunc_dim"), col("query_id"))
      .agg(count(lit(1)).as("__hits"))
    val dimsDf = df.sparkSession.createDataFrame(dims.map(Tuple1(_)))
      .toDF("trunc_dim")
    val spine = q.select(col("query_id")).crossJoin(broadcast(dimsDf))
    spine.join(hits, Seq("trunc_dim", "query_id"), "left")
      .na.fill(0L, Seq("__hits"))
      .groupBy(col("trunc_dim"))
      .agg(count(lit(1)).as("n_queries"),
        round(sum(col("__hits")).cast("double") /
          (count(lit(1)) * lit(k)), 6).as("recall_at_k"))
  }

  /** Metadata-filtered (hybrid) exact top-k: neighbors restricted to
    * rows sharing the query's `labelCol` value — "nearest documents in
    * the same language/source/tenant", the filtered-search shape every
    * vector store needs. The constraint is not a post-filter: it joins
    * the (tiny, broadcast) query set to the corpus ON the label, so the
    * scan prunes to matching rows before any dot product, and at scale
    * the equality becomes the shuffle key instead of a cross join.
    * Post-filtering a plain top-k would instead return < k rows
    * whenever the unconstrained neighborhood is dominated by other
    * labels.
    */
  def labelFilteredTopK(df: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, queryIds: Seq[Long],
                        k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("lbl"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("lbl").as("qlbl"))
    val scored = v.join(broadcast(q),
        col("lbl") === col("qlbl") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Hard-negative mining audit for embedding-model training (the
    * triplet/contrastive data-prep step): for each probe, the nearest
    * SAME-label neighbor (hardest positive anchor), the nearest
    * DIFFERENT-label neighbor (the hard negative), and the margin
    * between them. `is_hard` (margin < 0: a wrong-label vector sits
    * closer than every right-label one) flags exactly the probes worth
    * mining into training triplets — and doubles as a label-noise
    * detector.
    *
    * Determinism: cosines are 6dp-pinned before the argmax; ties break
    * to the LOWEST candidate id via a lexicographic struct max on
    * (cos, −id) — no row_number window needed, the whole selection is
    * one combinable aggregate. Probes with no same-label peer emit
    * null positive fields rather than vanishing.
    *
    * Scale shape: the probe batch is a FIXED id set (O(1) in the
    * corpus — the `sim_maxsim_topk` capping lesson), broadcast against
    * one corpus scan; per (probe, side) state is a single struct, so
    * the scan partial-aggregates to ≤ 2·|probes| cells per task.
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queryIds: Column): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("lbl"))
    // queryIds is a predicate over the CALLER's columns (a fixed id
    // batch, e.g. col("vec_id") < 2000 && col("vec_id") % 10 === 0)
    val q = df.filter(queryIds)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("qlbl"))
    val scored = v.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("qlbl"),
        (col("lbl") === col("qlbl")).as("same"),
        struct(round(cosine(col("qv"), col("v")), 6).as("c"),
          (-col("id")).as("nid")).as("cand"))
    scored.groupBy(col("query_id"), col("qlbl"))
      .agg(max(when(col("same"), col("cand"))).as("p"),
        max(when(!col("same"), col("cand"))).as("ng"))
      .select(col("query_id"), col("qlbl").as("label"),
        (-col("p.nid")).as("pos_id"), col("p.c").as("pos_cos"),
        (-col("ng.nid")).as("neg_id"), col("ng.c").as("neg_cos"),
        round(col("p.c") - col("ng.c"), 6).as("margin"),
        (round(col("p.c") - col("ng.c"), 6) < 0.0).as("is_hard"))
  }

  /** Margin-based candidate mining (Artetxe & Schwenk 2019, the
    * ratio-margin criterion behind CCMatrix/LASER bitext mining and
    * hard-positive retrieval): a raw cosine threshold cannot separate
    * "genuinely aligned pair" from "hub vector similar to everything",
    * so each candidate is scored by its cosine RELATIVE to what the
    * two sides score against their own neighborhoods —
    * `margin(q, x) = cos(q, x) / (meanₖ cos(q, ·)/2 + meanₖ cos(x, ·)/2)`.
    * Hubs get a large denominator and drop; isolated-but-aligned pairs
    * rise. Bidirectional as published, with the probe batch as side A:
    * the forward penalty is q's mean top-`knn` cosine over the CORPUS,
    * the backward penalty is x's mean top-`knn` cosine over the PROBE
    * set. Emits the top `k` candidates per probe by margin.
    *
    * Exactness: every cosine is pinned to a ×10⁶ BIGINT; the top-knn
    * penalty sums are exact integers; the margin clears denominators
    * into pure integer arithmetic —
    * `c6 · 2 · fk · bk / (fsum·bk + bsum·fk)` — with ONE double
    * division, rounded 6dp, so the oracle replays bit-for-bit.
    * Candidates whose denominator is ≤ 0 (both neighborhoods
    * anti-aligned — margin undefined in the published setting, which
    * assumes similarity-positive neighborhoods) are dropped before
    * ranking. Ranking orders by (rounded margin desc, id asc) — fully
    * deterministic under 6dp ties.
    *
    * Scale shape: the probe batch is a FIXED id set broadcast against
    * one corpus scan (the `sim_maxsim_topk` capping lesson); the
    * scored table is |corpus|·|probes| rows, and both penalty passes
    * are windows over it (one shuffle keyed by probe, one by
    * candidate) — O(|Q|·n) with |Q| fixed, linear in the corpus.
    */
  def marginMine(df: DataFrame, idCol: String, vecCol: String,
                 queryIds: Column, k: Int, knn: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && knn >= 1)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = df.filter(queryIds)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = v.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(cosine(col("qv"), col("v")) * 1e6).cast("long").as("c6"))
    val byQ = Window.partitionBy("query_id")
    val byQOrd = byQ.orderBy(col("c6").desc, col("id").asc)
    val byX = Window.partitionBy("id")
    val byXOrd = byX.orderBy(col("c6").desc, col("query_id").asc)
    val inF = col("rq") <= knn
    val inB = col("rx") <= knn
    val st = scored
      .withColumn("rq", row_number().over(byQOrd))
      .withColumn("rx", row_number().over(byXOrd))
      .withColumn("fsum", sum(when(inF, col("c6")).otherwise(0L)).over(byQ))
      .withColumn("fk", sum(when(inF, 1L).otherwise(0L)).over(byQ))
      .withColumn("bsum", sum(when(inB, col("c6")).otherwise(0L)).over(byX))
      .withColumn("bk", sum(when(inB, 1L).otherwise(0L)).over(byX))
    val denom = col("fsum") * col("bk") + col("bsum") * col("fk")
    val margin = round(
      (col("c6") * 2L * col("fk") * col("bk")).cast("double") /
        denom.cast("double"), 6)
    val ranked = st.filter(denom > 0L)
      .withColumn("margin", margin)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("margin").desc, col("id").asc)))
      .filter(col("rank") <= k)
    ranked.select(col("query_id"), col("id").as("neighbor_id"),
      round(col("c6").cast("double") / 1e6, 6).as("cosine"),
      col("margin"), col("rank").cast("int").as("rank"))
  }

  /** Unit-normalize an array vector (double math) so euclidean
    * clustering aligns with cosine geometry.
    */
  def normalized(vec: Column): Column = {
    val norm = sqrt(call_function("vec_dot", vec, vec))
    transform(vec, x => x.cast("double") / norm)
  }

  /** `greatest` over one-or-more columns (Spark's builtin rejects a
    * single argument — the degenerate one-centroid case of the pinned
    * quantizers, where plain PQ falls out of IVF×PQ). */
  private def greatest1(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head else greatest(cols: _*)

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * over the unit-normalized vectors partitions the corpus into
    * `numCells` cells; each query scores only the `nProbe` cells nearest
    * its own vector (centroid ranking is driver-side — the centroid
    * table is tiny), then exact cosine ranks within the probed cells.
    * The scale path pairs with [[lshTopK]]: IVF adapts cells to the data
    * distribution, LSH needs no training pass. With `labelCol` set the
    * search is metadata-filtered ([[labelFilteredTopK]]'s constraint):
    * candidates must share the query's label, enforced inside the
    * probed-cell scan before any dot product.
    */
  /** The trained-index internals of [[ivfTopK]], exposed so
    * [[AnnCertify.ivfCertificate]] can verify the self-consistency
    * invariants of the KMeans-adaptive path (assignment is argmin over
    * the emitted centroids, probes are the nearest cells, the top-k is
    * exactly the best of the probed candidates) without re-running the
    * training. Everything here IS the production pipeline — the
    * certificate consumes the same frames the public method ranks.
    *
    *  - `assigned`: (id, v, cell[, lbl]) — every corpus row with its
    *    trained cell
    *  - `centroids`: the trained coarse centroids in FEATURE space
    *    (unit-normalized vectors), driver-side
    *  - `probeRows`: the (query, probed cell) pairs the query planner
    *    chose
    *  - `queryVecs`: the queries' normalized feature arrays
    *  - `scored`: the probed-cell candidate set with exact 6dp cosines
    *  - `topk`: the public result
    */
  private[graft] final case class IvfParts(
      assigned: DataFrame,
      centroids: Seq[(Int, Array[Double])],
      probeRows: Seq[(Long, Int)],
      queryVecs: Seq[(Long, Array[Double])],
      scored: DataFrame,
      topk: DataFrame)

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, numCells: Int = 16,
              nProbe: Int = 4, maxTrainRows: Long = 100000,
              labelCol: Option[String] = None): DataFrame =
    ivfParts(df, idCol, vecCol, queryIds, k, numCells, nProbe,
      maxTrainRows, labelCol).topk

  private[graft] def ivfParts(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, numCells: Int,
              nProbe: Int, maxTrainRows: Long,
              labelCol: Option[String]): IvfParts = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
        array_to_vector(normalized(col(vecCol))).as("features") +:
        labelCol.map(c => col(c).as("lbl")).toSeq: _*))
    // a coarse quantizer only needs a sample: fitting on the full corpus
    // would make the training pass dominate at scale (the iterative
    // KMeans re-scans its input per iteration — unacceptable over 100 TB)
    val corpusN = v.count()
    val train =
      if (corpusN <= maxTrainRows) v
      else v.sample(withReplacement = false,
        maxTrainRows.toDouble / corpusN, seed = 42)
    val model = new KMeans().setK(numCells).setSeed(42).setMaxIter(10)
      .fit(train.select("features"))
    val assigned = model.transform(v)
      .select(col("id") +: col("v") +: col("prediction").as("cell") +:
        labelCol.map(_ => col("lbl")).toSeq: _*)
    val centroids = model.clusterCenters.map(_.toArray).zipWithIndex
    // per query: nearest nProbe centroids, computed on the driver from
    // the collected (tiny) query vectors
    val queryVecs = v.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("features")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector]("features").toArray)
    val probeRows = queryVecs.flatMap { case (qid, qv) =>
      centroids.map { case (c, cell) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, cell, d)
      }.sortBy(_._3).take(nProbe).map { case (q, cell, _) => (q, cell) }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val probes = probeRows.toDF("query_id", "cell")
    val q = assigned.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id") +: col("v").as("qv") +:
        labelCol.map(_ => col("lbl").as("qlbl")).toSeq: _*)
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("id") =!= col("query_id") &&
        // hybrid search: the metadata constraint prunes candidates
        // BEFORE any dot product, in the same probed-cell scan
        labelCol.map(_ => col("lbl") === col("qlbl")).getOrElse(lit(true)))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
    IvfParts(assigned,
      centroids.map { case (c, cell) => (cell, c) }.toSeq,
      probeRows.map { case (q, cell) => (q, cell) },
      queryVecs.toSeq, scored, topk)
  }

  /** Deterministic-replay IVF: the coarse centroids are PINNED to the
    * embedding rows named by `centroidIds` — no KMeans, no RNG — so the
    * whole index path (cell assignment, probe ranking, probed-cell scan,
    * exact in-cell re-rank) replays in the DuckDB oracle as plain SQL
    * and is hash-gated end-to-end. [[ivfTopK]] stays the adaptive-
    * quality production path; this twin proves the plumbing exactly.
    *
    * Scale shape: assignment is scan-side — a greatest() fold over
    * numCells native cosine calls per row inside whole-stage codegen,
    * no train pass, no shuffle. Probes and query vectors are broadcast;
    * the only shuffle is the row_number over probed-cell candidates.
    * Scores are rounded to 6dp BEFORE the argmax with centroid-id
    * tie-break, so assignment is engine-stable, not last-ulp-sensitive.
    */
  def ivfTopKPinned(df: DataFrame, idCol: String, vecCol: String,
                    queryIds: Seq[Long], k: Int, centroidIds: Seq[Long],
                    nProbe: Int, labelCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
        labelCol.map(c => col(c).as("lbl")).toSeq: _*))
    // tiny (numCells × dim doubles) — same bounded-collect pattern as
    // the query vectors in ivfTopK
    val centroids: Seq[(Long, Array[Double])] =
      v.filter(col("id").isin(centroidIds: _*))
        .select("id", "v").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .sortBy(_._1).toSeq
    require(centroids.size == centroidIds.size,
      s"pinned centroid ids missing from corpus: got ${centroids.size}" +
        s" of ${centroidIds.size}")
    // argmax (rounded score, then smallest centroid id): greatest() on
    // struct is lexicographic, so negate the id for the tie-break
    val best = greatest1(centroids.map { case (cid, c) =>
      struct(round(cosine(col("v"), typedLit(c)), 6).as("s"),
        lit(-cid).as("nc"))
    })
    val assigned = v.withColumn("cell", -best.getField("nc"))
    val qRows = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id") +: col("v").as("qv") +:
        labelCol.map(_ => col("lbl").as("qlbl")).toSeq: _*)
    val cellScores = array(centroids.map { case (cid, c) =>
      struct(round(cosine(col("qv"), typedLit(c)), 6).as("s"),
        lit(cid).as("cid"))
    }: _*)
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("cid"))
    val probes = qRows.select(col("query_id"), explode(cellScores).as("cs"))
      .select(col("query_id"), col("cs.s").as("s"), col("cs.cid").as("cid"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
    // each corpus row lives in exactly one cell and probes are distinct
    // cells, so candidates are already duplicate-free
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .join(broadcast(qRows), Seq("query_id"))
      .filter(col("id") =!= col("query_id") &&
        // hybrid search: the metadata constraint prunes candidates
        // BEFORE any dot product, inside the probed-cell scan
        labelCol.map(_ => col("lbl") === col("qlbl")).getOrElse(lit(true)))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic-replay IVF×PQ: [[ivfPqTopK]]'s index shape with both
    * quantizers PINNED to corpus rows — coarse centroids are the rows
    * named by `centroidIds` (as in [[ivfTopKPinned]]), and subspace `i`'s
    * codebook is the i-th slice of the unit-normalized rows named by
    * `codebookIds` (codeword id = rank of the row id). No KMeans, no RNG:
    * cell assignment, PQ encoding, the ADC scan (the production `pq_adc`
    * codegen kernel), the rerank cutoff and the exact re-rank all replay
    * in DuckDB SQL, hash-gating the full IVFADC plumbing.
    *
    * Engine-stability: float accumulation order is sequential on both
    * sides (pq_encode/vec_dot/pq_adc here, list_dot_product +
    * left-assoc per-subspace addition in the oracle), so scores agree
    * bitwise; the probe pick, ADC cutoff and final rank round to 6dp
    * with id tie-breaks, and the code pick argmins the raw
    * (bit-identical) distances with a smallest-index tie-break.
    * Encoding is scan-side — one native `pq_encode` kernel call per
    * row inside whole-stage codegen, no shuffle; probes/tables
    * broadcast as in the production path.
    */
  def ivfPqTopKPinned(df: DataFrame, idCol: String, vecCol: String,
                      queryIds: Seq[Long], k: Int, dim: Int,
                      centroidIds: Seq[Long], nProbe: Int,
                      m: Int, codebookIds: Seq[Long],
                      rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    val ksub = codebookIds.size
    val v = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        normalized(col(vecCol)).as("nv")))
    val centroids: Seq[(Long, Array[Double])] =
      v.filter(col("id").isin(centroidIds: _*))
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .sortBy(_._1).toSeq
    require(centroids.size == centroidIds.size, "missing centroid rows")
    // codeword id = rank of the pinned row id (replayed as row_number
    // over id in the oracle); codebook i = the rows' i-th nv slice
    val cbRows: Seq[Array[Double]] =
      v.filter(col("id").isin(codebookIds: _*))
        .select("id", "nv").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).map(_._2).toSeq
    require(cbRows.size == codebookIds.size, "missing codebook rows")
    val codewords: IndexedSeq[IndexedSeq[Array[Double]]] =
      (0 until m).map(i => (0 until ksub).map(c =>
        cbRows(c).slice(i * sub, (i + 1) * sub)))
    // coarse assignment: argmax (6dp cosine, then smallest centroid id),
    // scan-side greatest() fold as in ivfTopKPinned
    val bestCell = greatest1(centroids.map { case (cid, c) =>
      struct(round(cosine(col("v"), typedLit(c)), 6).as("s"),
        lit(-cid).as("nc"))
    })
    // PQ encode: per subspace, argmin squared-L2 codeword via the
    // native pq_encode kernel — one primitive loop per row inside
    // whole-stage codegen (a least()-fold over structs paid m*ksub
    // struct allocations + BigDecimal round()s per corpus row; this is
    // the per-row hot path). Unrounded argmin is engine-stable: both
    // engines accumulate identical doubles sequentially, and exact
    // ties take the smallest codeword index on both sides.
    val cbFlat: Array[Double] =
      codewords.flatten.flatten.toArray // (i*ksub + c)*sub + j layout
    val coded = v.withColumn("cell", -bestCell.getField("nc"))
      .withColumn("codes", call_function("pq_encode", col("nv"),
        typedLit(cbFlat), lit(m), lit(ksub)))
    // probes: top-nProbe cells per query by the same pinned score
    val qRows = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val cellScores = array(centroids.map { case (cid, c) =>
      struct(round(cosine(col("qv"), typedLit(c)), 6).as("s"),
        lit(cid).as("cid"))
    }: _*)
    val probes = qRows.select(col("query_id"), explode(cellScores).as("cs"))
      .select(col("query_id"), col("cs.s").as("s"), col("cs.cid").as("cid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("s").desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
    // per-query ADC tables from the collected normalized query vectors
    val qnv = v.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("nv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val tblRows = qnv.toSeq.map { case (qid, q) =>
      val tbl = Array.tabulate(m, ksub) { (i, c) =>
        var s = 0.0; var j = 0
        while (j < sub) { s += q(i * sub + j) * codewords(i)(c)(j); j += 1 }
        s
      }.flatten.toSeq
      (qid, tbl)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val tbls = tblRows.toDF("query_id", "tbl")
    val cand = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(tbls), Seq("query_id"))
      .withColumn("approx", round(
        call_function("pq_adc", col("tbl"), col("codes"), lit(ksub)), 6))
      .withColumn("arank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("approx").desc, col("id"))))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val exact = cand
      .join(v.select(col("id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
      .join(broadcast(qRows), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Product-quantization approximate top-k with asymmetric distance
    * computation: the unit-normalized vector is split into `m`
    * subspaces, each k-means'd into `ksub` centroids (fit on a capped
    * sample, like [[ivfTopK]]); the corpus then carries only the m
    * small codes per vector — m bytes against 4·dim for raw floats,
    * the ~32x compression that fits billion-vector indexes in memory
    * at corpus scale. A query never reconstructs vectors: it builds an
    * m×ksub table of partial dot products against every centroid once
    * (driver-side, tiny), and a candidate's approximate cosine is m
    * table lookups over its codes. The top `rerank` candidates per
    * query are re-ranked with the exact native cosine, absorbing the
    * quantization error.
    *
    * The ADC lookup is the native `pq_adc` Expression
    * ([[graft.functions.PqAdc]]) — a primitive loop inside whole-stage
    * codegen, since it is the one stage that touches every candidate
    * row. `dim` must be divisible by `m`.
    */
  /** The trained-index internals of [[pqTopK]] / [[ivfPqTopK]], exposed
    * so [[AnnCertify.pqCertificate]] can verify the KMeans-adaptive
    * paths' self-consistency invariants (codes are per-subspace argmin
    * over the emitted codebooks, the ADC shortlist is exactly the
    * approx-best `rerank` candidates, the top-k is exactly the best of
    * the shortlist by exact cosine — plus the coarse IVF invariants
    * when `coarse` is set). All frames ARE the production pipeline.
    */
  private[graft] final case class PqParts(
      coded: DataFrame,
      codebooks: IndexedSeq[IndexedSeq[Array[Double]]],
      coarse: Option[(Seq[(Int, Array[Double])], Seq[(Long, Int)])],
      queryVecs: Seq[(Long, Array[Double])],
      approxScored: DataFrame,
      shortlist: DataFrame,
      exactScored: DataFrame,
      topk: DataFrame)

  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int, dim: Int, m: Int = 8,
             ksub: Int = 16, rerank: Int = 50,
             maxTrainRows: Long = 100000): DataFrame =
    pqParts(df, idCol, vecCol, queryIds, k, dim, m, ksub, rerank,
      maxTrainRows).topk

  private[graft] def pqParts(df: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int, dim: Int, m: Int,
             ksub: Int, rerank: Int,
             maxTrainRows: Long): PqParts = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    val v = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        normalized(col(vecCol)).as("nv")))
    val withFeats = (0 until m).foldLeft(v) { (d, i) =>
      d.withColumn(s"f_$i", array_to_vector(slice(col("nv"), i * sub + 1, sub)))
    }
    val corpusN = v.count()
    val train =
      if (corpusN <= maxTrainRows) withFeats
      else withFeats.sample(withReplacement = false,
        maxTrainRows.toDouble / corpusN, seed = 42)
    // the m per-subspace fits are independent — submit them as
    // concurrent Spark jobs (sequential fits were 8 back-to-back
    // iterative job chains, ~7 s of pure scheduling at sf0.1)
    val models = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val cached = train.select((0 until m).map(i => col(s"f_$i")): _*).cache()
      cached.count()
      val fits = (0 until m).map { i =>
        Future {
          new KMeans().setK(ksub).setSeed(42 + i).setMaxIter(10)
            .setFeaturesCol(s"f_$i").setPredictionCol(s"c_$i")
            .fit(cached.select(s"f_$i"))
        }
      }
      val ms = Await.result(Future.sequence(fits), Duration.Inf)
      cached.unpersist()
      ms
    }
    // m projection-only transforms compose into one pass — no shuffle
    val coded = models.foldLeft(withFeats)((d, mod) => mod.transform(d))
      .select(col("id"), col("v"),
        array((0 until m).map(i => col(s"c_$i")): _*).as("codes"))
    val centroidArr = models.map(_.clusterCenters.map(_.toArray)).toArray
    val queryVecs = v.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("nv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val tblRows = queryVecs.toSeq.map { case (qid, qv) =>
      val tbl = Array.tabulate(m, ksub) { (i, c) =>
        var s = 0.0
        var j = 0
        while (j < sub) { s += qv(i * sub + j) * centroidArr(i)(c)(j); j += 1 }
        s
      }.flatten.toSeq
      (qid, tbl)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val tbls = tblRows.toDF("query_id", "tbl")
    // tracked: the ADC stream feeds the production cutoff AND (when
    // certified) the shortlist certificate's better-count join — the
    // cache manager substitutes the subtree in both consumers
    val approx = graft.data.ScopedCaches.track(
      coded.crossJoin(broadcast(tbls))
        .filter(col("id") =!= col("query_id"))
        .withColumn("approx",
          call_function("pq_adc", col("tbl"), col("codes"), lit(ksub))))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("id"))
    val cand = approx.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("approx"), col("arank"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val exact = cand
      .join(v.select(col("id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
    PqParts(coded,
      centroidArr.map(_.toIndexedSeq).toIndexedSeq,
      coarse = None, queryVecs.toSeq,
      approx.select(col("query_id"), col("id"), col("approx")),
      cand, exact, topk)
  }

  /** Test/diagnostic probe for [[ivfPqTopK]]: records how many corpus
    * rows the ADC stage actually scored, so pruning is assertable
    * (production callers pass None — no extra jobs run).
    */
  final class IvfPqDiag {
    @volatile var corpusRows: Long = -1L
    @volatile var adcScannedRows: Long = -1L
  }

  /** IVF×PQ composition — the standard billion-vector index shape
    * (IVFADC): a coarse KMeans quantizer assigns every vector to one of
    * `numCells` cells, and PQ codes (m sub-codebooks over the
    * unit-normalized vector) are stored per row; a query ADC-scans ONLY
    * the `nProbe` cells nearest its own vector instead of the whole
    * corpus — [[pqTopK]]'s one remaining linear pass, pruned by
    * expected factor numCells/nProbe. Candidates surviving the
    * approximate ranking are re-ranked with exact cosine, absorbing
    * both quantization and cell-boundary error (a neighbor in an
    * unprobed cell is the recall loss this trades for the pruning —
    * raise `nProbe` to buy it back).
    *
    * Both fits run on one capped sample; the m sub-codebook fits are
    * concurrent Spark jobs (same rationale as [[pqTopK]]). Codes are
    * computed against the raw normalized vector, not the cell residual
    * — residual PQ needs per-cell code streams and buys accuracy only
    * below the error the exact re-rank already absorbs here.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int, dim: Int, numCells: Int = 16,
                nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
                rerank: Int = 50, maxTrainRows: Long = 100000,
                diag: Option[IvfPqDiag] = None): DataFrame =
    ivfPqParts(df, idCol, vecCol, queryIds, k, dim, numCells, nProbe,
      m, ksub, rerank, maxTrainRows, diag).topk

  private[graft] def ivfPqParts(df: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int, dim: Int, numCells: Int,
                nProbe: Int, m: Int, ksub: Int,
                rerank: Int, maxTrainRows: Long,
                diag: Option[IvfPqDiag] = None): PqParts = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      normalized(col(vecCol)).as("nv"))
    val withFeats = graft.data.ScopedCaches.track(
      (0 until m).foldLeft(
          v.withColumn("features", array_to_vector(col("nv")))) { (d, i) =>
        d.withColumn(s"f_$i", array_to_vector(slice(col("nv"), i * sub + 1, sub)))
      })
    val corpusN = withFeats.count()
    val train =
      if (corpusN <= maxTrainRows) withFeats
      else withFeats.sample(withReplacement = false,
        maxTrainRows.toDouble / corpusN, seed = 42)
    // coarse quantizer + m sub-codebooks, all from the same sample; the
    // m+1 fits are independent -> concurrent Spark jobs
    val (coarse, models) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val cached = train
        .select(col("features") +: (0 until m).map(i => col(s"f_$i")): _*)
        .cache()
      cached.count()
      val coarseF = Future {
        new KMeans().setK(numCells).setSeed(42).setMaxIter(10)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(cached.select("features"))
      }
      val subFs = (0 until m).map { i =>
        Future {
          new KMeans().setK(ksub).setSeed(42 + i).setMaxIter(10)
            .setFeaturesCol(s"f_$i").setPredictionCol(s"c_$i")
            .fit(cached.select(s"f_$i"))
        }
      }
      val out = (Await.result(coarseF, Duration.Inf),
        Await.result(Future.sequence(subFs), Duration.Inf))
      cached.unpersist()
      out
    }
    // one projection-only encode pass: cell + m codes, no shuffle
    val coded = models.foldLeft(coarse.transform(withFeats))((d, mod) =>
        mod.transform(d))
      .select(col("id"), col("v"), col("cell"),
        array((0 until m).map(i => col(s"c_$i")): _*).as("codes"))
    val cellCentroids = coarse.clusterCenters.map(_.toArray).zipWithIndex
    val subCentroids = models.map(_.clusterCenters.map(_.toArray)).toArray
    val queryVecs = withFeats.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("nv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    // driver-side per query: nProbe nearest cells + the m x ksub ADC table
    val probeRows = queryVecs.toSeq.flatMap { case (qid, qv) =>
      cellCentroids.map { case (c, cell) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, cell, d)
      }.sortBy(_._3).take(nProbe).map { case (q, cell, _) => (q, cell) }
    }
    val tblRows = queryVecs.toSeq.map { case (qid, qv) =>
      val tbl = Array.tabulate(m, ksub) { (i, c) =>
        var s = 0.0
        var j = 0
        while (j < sub) { s += qv(i * sub + j) * subCentroids(i)(c)(j); j += 1 }
        s
      }.flatten.toSeq
      (qid, tbl)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val probes = probeRows.toDF("query_id", "cell")
    // THE pruned scan: only rows in probed cells reach the ADC lookup
    val probed = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
    diag.foreach { d =>
      d.corpusRows = corpusN
      d.adcScannedRows = probed.count()
    }
    // tracked for the same two-consumer reason as [[pqParts]]' ADC stream
    val approx = graft.data.ScopedCaches.track(
      probed.join(broadcast(tblRows.toDF("query_id", "tbl")),
          Seq("query_id"))
        .withColumn("approx",
          call_function("pq_adc", col("tbl"), col("codes"), lit(ksub))))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("id"))
    val cand = approx.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("approx"), col("arank"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val exact = cand
      .join(v.select(col("id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
    PqParts(coded,
      subCentroids.map(_.toIndexedSeq).toIndexedSeq,
      coarse = Some((cellCentroids.map { case (c, cell) => (cell, c) }.toSeq,
        probeRows.map { case (q2, cell) => (q2, cell) })),
      queryVecs.toSeq,
      approx.select(col("query_id"), col("id"), col("approx")),
      cand, exact, topk)
  }

  /** Deterministic pseudo-random hyperplanes (+-1 components) from a
    * splitmix-style hash — no RNG state, reproducible across runs and
    * cluster layouts. Shares [[graft.functions.LshKernel]]'s bit stream
    * so the literal-array form buckets identically to `lsh_buckets`.
    */
  private def hyperplane(planeIdx: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => graft.functions.LshKernel.planeSign(planeIdx, j))

  /** Centroid-based (simplified) silhouette per IVF cell — the
    * clustering-quality audit for a coarse quantizer: for each vector,
    * a = cosine distance to its own (nearest) pinned centroid, b =
    * distance to the second-nearest, s = (b−a)/max(a,b) ∈ [0,1] here
    * (a ≤ b by construction; a = b ⇒ 0). High mean s per cell = tight,
    * well-separated cell; low = the centroid budget is wrong or the
    * cell straddles a boundary — the go/no-go gauge before trusting an
    * IVF index's probe counts. This is the O(n·k) centroid variant
    * (Kaufman-Rousseeuw's full silhouette is O(n²) pairwise — never
    * acceptable at corpus scale).
    *
    * Same pinned-centroid convention as [[ivfTopKPinned]] (6dp-rounded
    * cosines, ties to the smaller centroid id), so cells here ARE the
    * index's cells. Determinism: per-point s is pinned to a ×10⁶
    * BIGINT before any aggregation — sums are exact integers in any
    * order; mean/min/max divide exact integers by exact powers of ten.
    *
    * Scale shape: centroids ride a bounded driver collect (numCells ×
    * dim — same pattern as the query vectors); the per-row top-2 is a
    * scan-side sort of a k-element literal-scored array (no explode,
    * no window over the corpus); one combinable groupBy(cell) ends it.
    */
  def silhouetteByCell(df: DataFrame, idCol: String, vecCol: String,
                       centroidIds: Seq[Long]): DataFrame = {
    require(centroidIds.size >= 2, "need at least two centroids")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val centroids: Seq[(Long, Array[Double])] =
      v.filter(col("id").isin(centroidIds: _*))
        .select("id", "v").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray)
        .sortBy(_._1).toSeq
    require(centroids.size == centroidIds.size,
      s"pinned centroid ids missing from corpus: got ${centroids.size}" +
        s" of ${centroidIds.size}")
    val scoreArr = array(centroids.map { case (cid, c) =>
      struct(round(cosine(col("v"), typedLit(c)), 6).as("s"),
        lit(-cid).as("nc"))
    }: _*)
    val top = sort_array(scoreArr, asc = false)
    val s0 = top.getItem(0).getField("s")
    val s1 = top.getItem(1).getField("s")
    val a = lit(1.0) - s0
    val b = lit(1.0) - s1
    val sil = when(a === b, lit(0.0)).otherwise((b - a) / b)
    val rows = v.select((-top.getItem(0).getField("nc")).as("cell"),
      round(sil * 1e6).cast("long").as("si"))
    rows.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("si")).cast("double") / lit(1e6) /
          count(lit(1)), 6).as("mean_sil"),
        (min(col("si")).cast("double") / lit(1e6)).as("min_sil"),
        (max(col("si")).cast("double") / lit(1e6)).as("max_sil"))
  }

  /** Johnson-Lindenstrauss distortion audit over consecutive-id pairs:
    * project every vector to `targetDim` dims through the pinned ±1
    * plane family (Achlioptas 2003 — database-friendly projections:
    * sign matrices satisfy the JL lemma with the same O(log n / ε²)
    * dimension bound as Gaussians, and ours are the deterministic
    * [[graft.functions.LshKernel]] stream, so the audit replays
    * exactly), then compare squared distances before vs after on the
    * (id, id+1) pair sample. `distortion` = (‖ya−yb‖²/targetDim) /
    * ‖va−vb‖² — the JL lemma says it concentrates in [1−ε, 1+ε]; the
    * audit table is the evidence for "how few dimensions can this
    * corpus afford", the sizing decision ahead of any IVF/LSH build.
    *
    * `planeOffset` defaults far past the LSH families so the audit is
    * independent of bucketing. The pair sample is an EQUI-join on
    * adjacent ids — linear, never the quadratic all-pairs; zero-
    * distance pairs emit null distortion rather than poisoning the
    * ratio. Scale shape: one scan computes projections (targetDim
    * codegen'd `vec_dot`s against literal planes), one id-keyed join
    * forms pairs; no shuffle beyond that join.
    */
  def jlDistortionPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, targetDim: Int,
                        planeOffset: Int = 4096): DataFrame = {
    require(targetDim >= 1 && targetDim <= dim,
      "targetDim must be in [1, dim]")
    val proj = array((0 until targetDim).map(p =>
      call_function("vec_dot", col("__v"),
        typedLit(hyperplane(planeOffset + p, dim)))): _*)
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v")).withColumn("__y", proj)
    val a = base.select(col("id").as("id1"), col("__v").as("__va"),
      col("__y").as("__ya"))
    val b = base.select((col("id") - 1).as("id1"), col("id").as("id2"),
      col("__v").as("__vb"), col("__y").as("__yb"))
    val d2o = call_function("vec_l2sq", col("__va"), col("__vb"))
    val d2p = call_function("vec_l2sq", col("__ya"), col("__yb"))
    a.join(b, "id1")
      .select(col("id1"), col("id2"),
        round(d2o, 6).as("d2_orig"),
        round(d2p / lit(targetDim.toDouble), 6).as("d2_proj_scaled"),
        when(d2o === 0, lit(null).cast("double"))
          .otherwise(round((d2p / lit(targetDim.toDouble)) / d2o, 6))
          .as("distortion"))
  }

  /** Sign-random-projection bucket id over `numPlanes` hyperplanes.
    * `planeOffset` selects an independent plane family — distinct offsets
    * give the independent hash tables of the OR-construction.
    */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int,
                planeOffset: Int = 0): Column =
    (0 until numPlanes).map { p =>
      val proj = call_function("vec_dot", vec,
        typedLit(hyperplane(planeOffset + p, dim)))
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Auto-size the OR-construction for corpus size `n` and threshold
    * `tau`: bits-per-table from `log2(n / targetOccupancy)` so expected
    * bucket occupancy — and with it candidates-per-row — stays constant
    * as the corpus grows (fixed bits make candidates quadratic in n:
    * occupancy ~ n/2^b, within-bucket pairs ~ occupancy^2); the table
    * count then compensates recall by `(1/p)^(b-b0)` with
    * `p = 1 - acos(tau)/pi` (the hyperplane collision probability), up
    * to `maxTables`. Past the cap, recall decays with n — the
    * fundamental n^rho LSH trade-off: cheap at realistic near-dup
    * thresholds (tau >= 0.8, p >= 0.8), steep at low tau where LSH is
    * the wrong tool and [[cosinePairs]] partitioned by time/source is
    * honest.
    */
  def lshAutoParams(n: Long, tau: Double, targetOccupancy: Int = 128,
                    basePlanes: Int = 4, baseTables: Int = 8,
                    maxTables: Int = 32): (Int, Int) = {
    // b = ceil(log2(n / targetOccupancy)) computed in INTEGER
    // arithmetic (smallest b with occupancy·2^b >= n, via the bit
    // length of ceil(n/occupancy) - 1), not floating log2: identical
    // outputs for every n, but exactly replayable by an oracle —
    // DuckDB's length(bin(m - 1)) is the same bit length, so a
    // count-derived oracle can never disagree with the engine at a
    // power-of-two boundary over a log-ulp.
    val m = (n + targetOccupancy - 1) / targetOccupancy
    val b0 = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    val b = math.min(20, math.max(basePlanes, b0))
    (b, lshTablesFor(b, tau, basePlanes, baseTables, maxTables))
  }

  /** Table count for bit width `b`: recall compensation
    * `ceil(baseTables · (1/p)^(b-basePlanes))` with
    * `p = 1 - acos(tau)/π`, clamped to [baseTables, maxTables]. Split
    * out of [[lshAutoParams]] so the SQL-oracle generator can inline
    * the same Scala-computed b→L mapping as a pinned CASE table — the
    * float path (acos/pow) then exists on ONE side only and the oracle
    * replays it exactly by construction.
    */
  def lshTablesFor(b: Int, tau: Double, basePlanes: Int = 4,
                   baseTables: Int = 8, maxTables: Int = 32): Int = {
    val p = 1.0 - math.acos(tau) / math.Pi
    val l = math.min(maxTables.toDouble,
      math.ceil(baseTables * math.pow(1.0 / p, (b - basePlanes).toDouble))).toInt
    math.max(baseTables, l)
  }

  /** All pairs with cosine >= tau at scale — the LSH path [[cosinePairs]]
    * defers to when n^2 is prohibitive (the near-dup dedup workload,
    * where tau is high). Standard OR-construction: every vector posts
    * into one bucket per independent hash table (`tables` families of
    * `numPlanes` sign-random-projection bits) plus `probes` Hamming-1
    * probe buckets per table; two vectors sharing any posted (table,
    * bucket) become a candidate pair, verified by exact cosine — so
    * false positives are impossible and recall is
    * `1 - (1 - p^b)^tables` per pair (p = 1 - angle/pi), tightened
    * further by the probes.
    *
    * Verification is BUCKET-LOCAL: each posting row carries its vector
    * into the (table, bucket) self-join, and the exact cosine + tau
    * filter run inside the join stage, so a candidate pair exists only
    * as a transient row that is scored and filtered in place. The
    * payload shuffled is O(n * tables * (1+probes)) vectors — linear in
    * the corpus. The alternative (ids-only candidates, vectors joined
    * back afterwards) shuffles the CANDIDATE stream with payloads:
    * candidates run ~occupancy x postings (~100x postings at the target
    * occupancy 128), and past the broadcast threshold that join is
    * sort-merge — at the factor-100 rehearsal (200k vectors, 114M+
    * candidates) it sorted ~100 GB of candidate x vector rows and
    * filled a 79 GB disk; a shuffle_hash hint still shuffles the same
    * payload volume. Bucket-local scoring never materializes it at all.
    * Tau-survivors (a vanishing fraction) are deduped at the end — a
    * pair sharing several buckets is scored once per bucket, ~2.4x
    * average multiplicity, ~10x cheaper per row than a candidate-level
    * distinct (measured 34 s distinct vs 4 s verify at 114M candidates).
    * Each table's buckets are bounded to ~targetOccupancy rows by
    * [[lshAutoParams]]; no n^2 stage ever forms. `numPlanes = 0` sizes
    * both parameters from the corpus count (costs one count job).
    */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     tau: Double, dim: Int, numPlanes: Int = 0,
                     tables: Int = 8, probes: Int = 0): DataFrame = {
    // cached: the projection feeds the auto-sizing count AND the
    // postings build regardless of how the params were chosen
    val v = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v")))
    val (planes, tbls) =
      if (numPlanes > 0) (numPlanes, tables)
      else lshAutoParams(v.count(), tau)
    require(tbls >= 1 && probes >= 0 && probes <= planes)
    // all table buckets in one native-kernel call per row
    // ([[graft.functions.LshBuckets]]): the equivalent column expression
    // (tables x planes literal-array vec_dots) exceeds the whole-stage
    // codegen budget and falls back to interpreted boxed eval
    val own = v.select(col("id"), col("v"),
      posexplode(call_function("lsh_buckets", col("v"), lit(tbls), lit(planes))))
      .select(col("id"), col("v"), col("pos").as("t"), col("col").as("own"))
    val probeBuckets = array((lit(0) +:
      (0 until probes).map(p => lit(1 << p))).map(col("own").bitwiseXOR): _*)
    val posts = own.select(col("id"), col("v"), col("t"),
      explode(probeBuckets).as("bucket"))
    posts.toDF("id1", "v1", "t", "bucket")
      .join(posts.toDF("id2", "v2", "t", "bucket"), Seq("t", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cosine"))
      .filter(col("cosine") >= tau)
      .distinct()
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus its `probes` Hamming-1 neighbor buckets (multi-probe — near
    * misses on one hyperplane sign are the dominant recall loss), then
    * exact cosine ranking within them. Bucket count 2^numPlanes bounds
    * each candidate list to ~(1+probes)*n/2^numPlanes — the 100 TB path
    * where the brute-force cross join is impossible.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, dim: Int,
              numPlanes: Int = 8, probes: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probes >= 0 && probes <= numPlanes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), dim, numPlanes).as("bucket"))
    val qBase = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    // probe buckets: the query's own, plus flips of the first `probes` bits
    val probeBuckets = array((lit(0) +:
      (0 until probes).map(p => lit(1 << p))).map(col("bucket").bitwiseXOR): _*)
    val q = qBase.select(col("query_id"), col("qv"),
      explode(probeBuckets).as("bucket"))
    val scored = v.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .distinct() // a candidate can surface through several probe buckets
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** TwoNN intrinsic-dimension estimate (Facco et al. 2017): the MLE
    * d̂ = n_valid / Σ ln(d₂/d₁) over each point's ratio of 2nd- to
    * 1st-nearest-neighbor distance — how many dimensions the
    * embedding cloud ACTUALLY occupies, which is what decides whether
    * IVF/LSH/PQ recall targets are achievable at a given probe budget
    * (a 64-dim table with intrinsic dim 9 indexes like 9, not 64).
    * Points whose nearest neighbor is an exact duplicate (d₁ = 0) are
    * excluded and reported.
    *
    * This is the labeled EXACT all-pairs baseline (like
    * `cosinePairsExact`): an O(n²) pair scan through the codegen
    * `vec_l2sq` kernel, then a per-point top-2 window. ln(d₂/d₁) =
    * ½·ln(l2sq₂/l2sq₁) is pinned to a ×10⁹ BIGINT per point (both
    * engines round the same double), so the cross-point sum is
    * summation-order-free; the estimate is one fixed-order division.
    * At corpus scale run it on a [[Sampling.hashSample]] — the
    * estimator is a per-point local quantity, unbiased under uniform
    * subsampling of the cloud only insofar as density is preserved, so
    * sample whole shards, not per-point.
    */
  def intrinsicDimTwoNN(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    val base = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v")))
    val a = base.select(col("id").as("id1"), col("v").as("v1"))
    val b = base.select(col("id").as("id2"), col("v").as("v2"))
    val l2 = call_function("vec_l2sq", col("v1"), col("v2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id1")).orderBy(col("l2").asc, col("id2").asc)
    val top2 = a.join(b, col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"), l2.as("l2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val nn = top2.groupBy(col("id1"))
      .agg(min(when(col("rn") === 1, col("l2"))).as("l1"),
        min(when(col("rn") === 2, col("l2"))).as("l2nd"))
    val lnr = round(lit(0.5) * log(col("l2nd") / col("l1")) * lit(1.0e9))
      .cast("long")
    nn.select(col("id1"),
        when(col("l1") > 0, lnr).otherwise(lit(null)).as("lnr"))
      .agg(count(lit(1)).as("n"), count(col("lnr")).as("n_valid"),
        sum(col("lnr")).as("slnr"))
      .select(col("n"), col("n_valid"),
        when(col("slnr") > 0,
          round(col("n_valid").cast("double") /
            (col("slnr").cast("double") / 1.0e9), 6))
          .otherwise(lit(null).cast("double")).as("id_mle"))
  }

  /** Local Outlier Factor (Breunig et al. 2000) over an embedding
    * column, on SQUARED L2 distances (monotone in L2, so the kNN sets
    * are identical; the density ratios differ from the classical
    * metric-distance LOF by a documented, fixed transform — the
    * ordering-by-anomaly readout is what the operator is for).
    * LOF ≈ 1 means the point sits at its neighbors' density; ≫ 1 means
    * it is isolated relative to its own neighborhood — the curation
    * signal that catches mislabeled/garbage embeddings a global
    * z-score on any one coordinate cannot.
    *
    * Labeled EXACT all-pairs baseline (like [[intrinsicDimTwoNN]]):
    * O(n²) pairs through the codegen `vec_l2sq` kernel, a per-point
    * top-k window, then three domain-keyed joins (k-distance of the
    * neighbor, lrd of the neighbor). Reachability distances and local
    * reachability densities are pinned to ×10⁹ / ×10¹⁸-scaled BIGINTs,
    * so every cross-row sum is an exact integer sum and the final
    * ranking is total-order deterministic — the whole chain replays
    * exactly in SQL. Points whose k neighbors are all exact duplicates
    * (Σ reach = 0) have undefined density: their lrd is null and the
    * null propagates out of any LOF it touches (count-guarded — never
    * a silent skip). At corpus scale run it per [[Sampling.hashSample]]
    * shard or over IVF-cell-local neighborhoods — LOF is a local
    * quantity, the same subsampling argument as TwoNN.
    */
  def lofOutliers(df: DataFrame, idCol: String, vecCol: String,
                  k: Int = 5, topK: Int = 20): DataFrame = {
    require(k >= 1 && topK >= 1, s"need k,topK >= 1; got k=$k topK=$topK")
    val base = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v")))
    val a = base.select(col("id").as("id1"), col("v").as("v1"))
    val b = base.select(col("id").as("id2"), col("v").as("v2"))
    val l2 = call_function("vec_l2sq", col("v1"), col("v2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id1")).orderBy(col("l2").asc, col("id2").asc)
    val knn = graft.data.ScopedCaches.track(
      a.join(b, col("id1") =!= col("id2"))
        .select(col("id1"), col("id2"), l2.as("l2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("id1"), col("id2"),
          round(col("l2") * lit(1.0e9)).cast("long").as("d9")))
    val kd = knn.groupBy(col("id1").as("id"))
      .agg(max(col("d9")).as("kd9"))
    // lrd(i) = k / Σ_{j∈kNN(i)} max(kdist(j), d(i,j)), ×1e9-pinned
    val lrd = knn
      .join(kd.select(col("id").as("id2"), col("kd9")), "id2")
      .groupBy(col("id1").as("id"))
      .agg(sum(greatest(col("kd9"), col("d9"))).as("srd9"))
      .select(col("id"),
        when(col("srd9") > 0,
          round(lit(k.toDouble * 1.0e18) / col("srd9").cast("double"))
            .cast("long")).as("lrd9"))
    val lof = knn
      .join(lrd.select(col("id").as("id2"), col("lrd9").as("nl9")), "id2")
      .groupBy(col("id1"))
      .agg(sum(col("nl9")).as("snl9"), count(col("nl9")).as("n_nl"))
      .join(lrd.select(col("id").as("id1"), col("lrd9")), "id1")
      .select(col("id1").as("id"),
        when(col("n_nl") === k && col("lrd9").isNotNull,
          round(col("snl9").cast("double") /
            (lit(k.toDouble) * col("lrd9").cast("double")), 6))
          .as("lof"))
    val top = lof.filter(col("lof").isNotNull)
      .orderBy(col("lof").desc, col("id")).limit(topK)
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("lof").desc, col("id"))
    top.withColumn("rank", row_number().over(wRank).cast("long"))
      .select(col("id"), col("lof"), col("rank"))
  }

  /** Alignment and uniformity (Wang & Isola, ICML 2020) — the two-axis
    * quality readout for a contrastive embedding space: alignment =
    * mean ‖x−y‖² over positive (same-label) pairs (should be small:
    * same-class points land together), uniformity =
    * log E[exp(−2‖x−y‖²)] over ALL pairs (should be very negative:
    * the cloud spreads over the sphere instead of collapsing).
    * Collapse shows up as great alignment AND terrible uniformity —
    * neither number alone catches it, which is exactly why the pair is
    * the standard diagnostic before training on an embedding table.
    *
    * Labeled EXACT all-pairs baseline (i<j once per pair) through the
    * codegen `vec_l2sq` kernel — both statistics in ONE conditional
    * aggregate over the same pair scan. Each pair's d² and exp(−2d²)
    * are ×10⁹-pinned BIGINTs, so the cross-pair sums are exact integer
    * sums in any order; the final ratios/log are fixed-order. (The
    * exp pin tolerates libm last-ulp drift: ~1e−16 against a 5e−10
    * rounding boundary — the same exposure the Pettitt p-value
    * accepts.) At corpus scale run on a [[Sampling.hashSample]]:
    * both are means over pairs, unbiased under uniform subsampling.
    */
  def alignmentUniformity(df: DataFrame, idCol: String, vecCol: String,
                          labelCol: String): DataFrame = {
    val base = graft.data.ScopedCaches.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        col(labelCol).as("lbl")))
    val a = base.select(col("id").as("id1"), col("v").as("v1"),
      col("lbl").as("l1"))
    val b = base.select(col("id").as("id2"), col("v").as("v2"),
      col("lbl").as("l2"))
    val d2 = call_function("vec_l2sq", col("v1"), col("v2"))
    val pairs = a.join(b, col("id1") < col("id2"))
      .select((col("l1") === col("l2")).as("pos"),
        round(d2 * lit(1.0e9)).cast("long").as("d9"),
        round(exp(d2 * lit(-2.0)) * lit(1.0e9)).cast("long").as("e9"))
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(col("e9").cast("decimal(38,0)")).as("se9"),
        sum(when(col("pos"), lit(1L))).as("n_pos"),
        sum(when(col("pos"), col("d9")).cast("decimal(38,0)")).as("sd9"))
      .select(col("n_pairs"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("sd9").cast("double") / lit(1.0e9) /
            col("n_pos").cast("double"), 6)).as("alignment"),
        when(col("se9") > 0,
          round(log(col("se9").cast("double") / lit(1.0e9) /
            col("n_pairs").cast("double")), 6)).as("uniformity"))
  }
}

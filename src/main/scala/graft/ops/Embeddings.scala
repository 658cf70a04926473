package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column pipeline operators beyond similarity search:
  * per-class centroids (corpus analysis / nearest-class-mean
  * classification) and int8 quantization (the standard 4x storage
  * compression for embedding tables at corpus scale).
  */
object Embeddings {

  /** Per-label centroid, one output row per (label, dimension):
    * (`labelCol`, `pos`, `n`, `c`) with `c` the mean of dimension `pos`
    * over the label's vectors, rounded to 6dp. Row-per-dimension output
    * (not a reassembled array) keeps both the aggregation and the
    * oracle plain.
    *
    * Scale shape: `posexplode` blows each vector into dim rows, but the
    * `groupBy(label, pos)` aggregate is map-side combinable, so each
    * task ships only labels x dim partial sums into the single shuffle —
    * the explode never hits the wire. No driver-side collection, no
    * vector-length assumptions.
    */
  def labelCentroids(df: DataFrame, idCol: String, vecCol: String,
                     labelCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x").cast("double")), 6).as("c"))

  /** One pinned Lloyd (k-means) iteration over the embedding corpus:
    * assign every vector to its nearest centroid by squared Euclidean
    * distance (6dp-rounded, ties to the lower centroid id), then emit
    * the UPDATED per-(cell, dimension) means together with each cell's
    * size and inertia (sum of member distances — the convergence
    * signal). Centroids are pinned to the corpus rows named by
    * `centroidIds` — the same deterministic-replay discipline as
    * [[Similarity.ivfTopKPinned]], so any engine reproduces the
    * assignment, the means, and the inertia exactly; a full k-means
    * fit is this operator iterated with each round's means fed back as
    * literals.
    *
    * Scale shape: the centroid table is a bounded driver collect
    * (cells × dim doubles, same pattern as the pinned IVF index); the
    * argmin is a SCAN-SIDE fold over centroid literals (`greatest` on
    * (−dist, −cid) structs — no crossJoin row explosion, no window over
    * the corpus). The `posexplode` for the means never hits the wire:
    * the (cell, pos) aggregate is map-side combinable, so each task
    * ships cells × dim partial sums, and cell stats ride a second
    * domain-sized aggregate joined back by broadcast.
    */
  def kmeansUpdatePinned(df: DataFrame, idCol: String, vecCol: String,
                         centroidIds: Seq[Long]): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val centroids: Seq[(Long, Array[Double])] =
      v.filter(col("id").isin(centroidIds: _*))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).toSeq
    require(centroids.size == centroidIds.size,
      s"pinned centroid ids missing from corpus: got ${centroids.size}" +
        s" of ${centroidIds.size}")
    def sqdist(c: Array[Double]): Column =
      round(aggregate(
        zip_with(col("v"), typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0d), _ + _), 6)
    // argmin by (rounded distance, then smallest centroid id):
    // greatest() on (−dist, −cid) structs is lexicographic
    val best = greatest(centroids.map { case (cid, c) =>
      struct((-sqdist(c)).as("nd"), lit(-cid).as("nc"))
    }: _*)
    val assigned = v.select(
      (-best.getField("nc")).as("cell"),
      (-best.getField("nd")).as("sd"), col("v"))
    val cellStats = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), round(sum(col("sd")), 6).as("inertia"))
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("x")), 6).as("c_new"))
      .join(broadcast(cellStats), Seq("cell"))
      .select(col("cell"), col("pos"), col("n"), col("c_new"),
        col("inertia"))
  }

  /** Nearest-centroid classifier evaluation: assign every vector to
    * the closest label centroid (squared Euclidean against the
    * 6dp-rounded [[labelCentroids]] means, ties to the lower label) and
    * report the confusion matrix with overall resubstitution accuracy —
    * the cheapest possible probe of "do the labels have geometric
    * structure worth an index / a classifier?" (accuracy ≈ 1/|labels|
    * says the embedding carries no label signal and a same-label ANN
    * restriction buys nothing).
    *
    * Scale shape: the centroid table is a bounded driver collect
    * (labels × dims doubles — the pinned-IVF pattern); assignment is a
    * scan-side argmin fold over centroid literals through the
    * `vec_l2sq` codegen kernel (no explode × cells join), and the
    * confusion aggregate is |labels|²-sized and map-side combinable.
    */
  def centroidClassifierEval(df: DataFrame, idCol: String, vecCol: String,
                             labelCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{call_function, typedLit}
    val v = df.select(col(labelCol).cast("int").as("true_label"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cents: Seq[(Int, Array[Double])] =
      labelCentroids(df, idCol, vecCol, labelCol)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3)))
        .groupBy(_._1)
        .map { case (lb, rows) =>
          lb -> rows.sortBy(_._2).map(_._3).toArray
        }.toSeq.sortBy(_._1)
    require(cents.nonEmpty, "no labels in corpus")
    def sqd(c: Array[Double]): Column =
      round(call_function("vec_l2sq", col("v"), typedLit(c)), 6)
    // argmin by (rounded distance, then smallest label):
    // greatest() on (−dist, −label) structs is lexicographic
    val best = greatest(cents.map { case (lb, c) =>
      struct((-sqd(c)).as("nd"), lit(-lb).as("nl"))
    }: _*)
    val conf = v
      .select(col("true_label"), (-best.getField("nl")).as("pred_label"))
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("cnt"))
    val acc = conf.agg((sum(when(col("true_label") === col("pred_label"),
      col("cnt")).otherwise(0L)).cast("double") / sum(col("cnt")))
      .as("__acc"))
    conf.crossJoin(broadcast(acc))
      .select(col("true_label"), col("pred_label"), col("cnt"),
        round(col("__acc"), 6).as("accuracy"))
  }

  /** k-NN majority-vote classifier eval: for each held-out query
    * vector, the k nearest corpus neighbors (6dp cosine, id
    * tie-break) vote with their labels; prediction = most votes, ties
    * to the smaller label. The local-neighborhood complement of
    * [[centroidClassifierEval]] (centroids assume unimodal classes;
    * k-NN doesn't care) — together they bracket "is the label signal
    * geometric, and is it global or local?". Same confusion-matrix +
    * exact integer-accuracy output shape. Scale: broadcast query set,
    * one codegen pair scan, two windows on the same query_id
    * partitioning, |labels|²-sized combinable confusion.
    */
  def knnClassifierEval(df: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, queryPred: Column,
                        k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k >= 1, got $k")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("lbl"))
    val q = df.filter(queryPred).select(col(idCol).as("qid"),
      col(vecCol).as("qv"), col(labelCol).as("true_label"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("true_label"), col("id"), col("lbl"),
        round(graft.ops.Similarity.cosine(col("qv"), col("v")), 6)
          .as("cos"))
    val wk = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    val top = scored.withColumn("__rn", row_number().over(wk))
      .filter(col("__rn") <= k)
    val votes = top.groupBy(col("qid"), col("true_label"), col("lbl"))
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("lbl").asc)
    val pred = votes.withColumn("__vr", row_number().over(wv))
      .filter(col("__vr") === 1)
      .select(col("true_label"), col("lbl").as("pred_label"))
    val conf = pred.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("cnt"))
    val acc = conf.agg((sum(when(col("true_label") === col("pred_label"),
      col("cnt")).otherwise(0L)).cast("double") / sum(col("cnt")))
      .as("__acc"))
    conf.crossJoin(broadcast(acc))
      .select(col("true_label"), col("pred_label"), col("cnt"),
        round(col("__acc"), 6).as("accuracy"))
  }

  /** Per-vector symmetric int8 quantization: scale = max |x_i| (so
    * codes span the full [-127, 127] range), code_i = round(x_i / scale
    * * 127). Returns (`idCol`, `scale` rounded 6dp, `codes`
    * array<int>). Zero-shuffle — pure scan-side `transform`; the codes
    * column is the 4x-smaller representation an embedding store ships
    * to disk, with `scale` the per-vector dequantization factor.
    * All-zero vectors quantize to all-zero codes (scale 0 guarded).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol),
      round(scale, 6).as("scale"),
      transform(col(vecCol), x =>
        when(scale === 0d, lit(0))
          .otherwise(round(x.cast("double") / scale * 127, 0).cast("int")))
        .as("codes"))
  }

  /** Per-vector int8 quantization distortion as SNR in dB:
    * 10·log10(Σx² / Σ(x − dequant(quant(x)))²) with the same symmetric
    * scale/rounding as [[int8Quantize]] — the audit that decides
    * whether 4x storage compression is free for a given corpus (SNR
    * ≳ 40 dB: downstream cosines are unaffected). dB, not raw MSE, on
    * purpose: per-dim MSE at int8 step sizes is ~1e-7, beneath a
    * 6dp-rounded gate's resolution; the log-ratio is O(40) and
    * hash-stable. Zero-noise vectors (exactly representable, incl.
    * all-zero) emit null.
    *
    * Scale shape: entirely scan-side higher-order functions — one pass,
    * no shuffle, no explode; per-row output partitioned like the input.
    */
  def int8Snr(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val s = array_max(transform(x, e => abs(e)))
    // dequantized error term; arithmetic order (e/s*127, c*s/127) is
    // left-associative on BOTH engines so every element is bit-identical
    val err = transform(x, e =>
      when(s === 0d, e).otherwise(e - round(e / s * 127, 0) * s / 127))
    val sig = aggregate(transform(x, e => e * e), lit(0d), (a, e) => a + e)
    val noise = aggregate(transform(err, e => e * e), lit(0d), (a, e) => a + e)
    df.select(col(idCol), sig.as("__sig"), noise.as("__noise"))
      .select(col(idCol),
        round(when(col("__noise") === 0d, lit(null))
          .otherwise(lit(10d) * log10(col("__sig") / col("__noise"))), 6)
          .as("snr_db"))
  }

  /** Full-batch logistic-regression training epochs over the embedding
    * corpus — the distributed-ML training step as a Spark plan: each
    * epoch is exactly the data-parallel allreduce shape (per-partition
    * partial gradients → one combine → broadcast the updated weights),
    * expressed as a combinable per-dimension aggregate plus a broadcast
    * one-row weight table. No driver-side vector collects, mirroring
    * [[pcaTopComponent]]:
    *
    *   margin_i = x_i · w + b    — scan-side fold vs the broadcast w
    *   p_i      = sigmoid(margin_i)
    *   grad     = avg_i (p_i − y_i) x_i   — posexplode that never hits
    *              the wire (partial aggregation → d cells per task)
    *   w'       = round6(w − lr·grad)     — weights PINNED to 6dp per
    *              epoch (CUSUM's rule) so every epoch's input state is
    *              exactly replayable and cross-engine float-sum drift
    *              cannot compound across epochs
    *
    * Epoch 1 from w=0 gives margin exactly 0 and p exactly 0.5 in any
    * IEEE engine, so the whole recursion is anchored. Output: one row
    * per dimension (`pos`, final `weight`) with the `bias`, corpus
    * `logloss` and decision `accuracy` (integer-count ratio — exact)
    * of the final weights repeated — the eval pass a training loop
    * reports per epoch.
    */
  def logregEpochs(df: DataFrame, vecCol: String, labelCol: String,
                   posLabel: Int, lr: Double, epochs: Int): DataFrame = {
    require(epochs >= 1 && lr > 0, s"need epochs >= 1 and lr > 0")
    val x = graft.data.ScopedCaches.materialize(
      df.select(col(vecCol).cast("array<double>").as("x"),
        when(col(labelCol) === posLabel, 1.0).otherwise(0.0).as("y")))
    def margin(w: Column, b: Column): Column =
      aggregate(zip_with(col("x"), w, (a, c) => a * c), lit(0d),
        (acc, e) => acc + e) + b
    var wb = x.limit(1).select(
      transform(col("x"), _ => lit(0.0)).as("w"), lit(0.0).as("b"))
    for (_ <- 1 to epochs) {
      val scored = x.crossJoin(broadcast(wb))
        .select(col("x"), col("y"),
          (lit(1.0) / (lit(1.0) + exp(-margin(col("w"), col("b")))))
            .as("p"))
      val grad = scored
        .select(col("p"), col("y"), posexplode(col("x")).as(Seq("pos", "xv")))
        .groupBy(col("pos"))
        .agg(avg((col("p") - col("y")) * col("xv")).as("g"))
      val wPrev = wb.select(col("b"), posexplode(col("w")).as(Seq("pos", "wp")))
      val bNew = scored.agg(avg(col("p") - col("y")).as("gb"))
        .crossJoin(broadcast(wb.select(col("b"))))
        .select(round(col("b") - lit(lr) * col("gb"), 6).as("bn"))
      wb = grad.join(wPrev, "pos")
        .select(col("pos"), round(col("wp") - lit(lr) * col("g"), 6).as("wn"))
        .agg(sort_array(collect_list(struct(col("pos"), col("wn")))).as("ws"))
        .select(transform(col("ws"), e => e.getField("wn")).as("w"))
        .crossJoin(broadcast(bNew)).select(col("w"), col("bn").as("b"))
    }
    val ev = x.crossJoin(broadcast(wb))
      .select(col("y"), margin(col("w"), col("b")).as("m"))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("m"))))
    val met = ev.agg(
      round(avg(-(col("y") * log(col("p")) +
        (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))), 6).as("logloss"),
      round(sum(when((col("m") >= 0) === (col("y") === 1.0), 1L)
        .otherwise(0L)).cast("double") / count(lit(1)), 6).as("accuracy"))
    wb.select(col("b"), posexplode(col("w")).as(Seq("pos", "weight")))
      .crossJoin(broadcast(met))
      .select(col("pos"), col("weight"), round(col("b"), 6).as("bias"),
        col("logloss"), col("accuracy"))
  }

  /** Top principal component of the embedding corpus by `iters` pinned
    * power iterations — the dimensionality-reduction primitive (PCA
    * whitening, spectral dedup diagnostics) kept FULLY declarative: no
    * driver-side vector collects; every iteration is two joins + two
    * map-side-combinable aggregates over the centered (row, dim, value)
    * table, with the current direction broadcast (d rows).
    *
    *   mu    = per-dimension mean (one aggregate)
    *   c     = centered values, materialized once (reused 2x per iter)
    *   v_0   = 1/sqrt(d) * (1,...,1)       — pinned deterministic init
    *   s_i   = (x_i - mu) . v              — scan-side after a pos-join
    *   y     = sum_i s_i (x_i - mu)        — combinable (pos) aggregate
    *   v'    = y / ||y||
    *
    * Output: one row per dimension (`pos`, `loading` of the final unit
    * direction, `eigval` = Rayleigh quotient v_prev . y / N — the
    * biased per-row variance along the component). 6dp rounding only at
    * the end: the iteration's cross-engine drift is summation-order
    * noise (~1e-12), far below the rounding grain; the sign is pinned
    * by the all-positive v_0.
    *
    * Scale shape: the posexplode never hits the wire (partial aggregates
    * reduce each task to d rows); per iteration one shuffle on `vid` and
    * one on `pos`, both AQE-coalesced; the centered table is the only
    * cache and is row x dim sized. Deep iteration counts should
    * checkpoint the direction instead of unrolling the plan.
    */
  def pcaTopComponent(df: DataFrame, idCol: String, vecCol: String,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val x = df.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("vec"))
    // per-dimension mean as ONE one-row array (pos-sorted), broadcast
    val muArr = x.select(posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("mu"))
      .agg(sort_array(collect_list(struct(col("pos"), col("mu")))).as("ms"))
      .select(transform(col("ms"), e => e.getField("mu")).as("mu"))
    // centered corpus, STILL IN ARRAY FORM — the iteration never joins
    // a row-sized table: the projection s_i is a scan-side fold against
    // the broadcast direction, so each iteration costs one scan plus a
    // d-sized combinable aggregate (the posexplode below never hits the
    // wire — partial aggregation reduces each task to d cells).
    val c = graft.data.ScopedCaches.materialize(
      x.crossJoin(broadcast(muArr))
        .select(col("vid"),
          zip_with(col("vec"), col("mu"), (a, b) => a - b).as("cv")))
    val dim = size(col("cv"))
    var v = c.limit(1).select(
      transform(col("cv"), _ => lit(1.0) / sqrt(dim.cast("double")))
        .as("w"))
    var vPrev = v
    var y: DataFrame = null
    for (_ <- 1 to iters) {
      vPrev = v
      val s = c.crossJoin(broadcast(v)).select(col("cv"),
        aggregate(zip_with(col("cv"), col("w"), (a, b) => a * b),
          lit(0d), (acc, e) => acc + e).as("s"))
      y = s.select(posexplode(transform(col("cv"), e => e * col("s")))
          .as(Seq("pos", "sv")))
        .groupBy(col("pos")).agg(sum(col("sv")).as("y"))
      val nrm = y.agg(sqrt(sum(col("y") * col("y"))).as("__nrm"))
      // zero-variance corpus (all vectors identical): direction is
      // undefined — emit nulls rather than an ANSI divide-by-zero
      val yArr = y.agg(sort_array(collect_list(struct(col("pos"), col("y"))))
        .as("ys"))
      v = yArr.crossJoin(broadcast(nrm))
        .select(transform(col("ys"), e =>
          when(col("__nrm") === 0d, lit(null))
            .otherwise(e.getField("y") / col("__nrm"))).as("w"))
    }
    val nr = df.agg(count(lit(1)).cast("double").as("__nr"))
    val lam = vPrev.select(posexplode(col("w")).as(Seq("pos", "wp")))
      .join(y, "pos")
      .agg(sum(col("wp") * col("y")).as("__lam"))
      .crossJoin(nr).select((col("__lam") / col("__nr")).as("__ev"))
    v.select(posexplode(col("w")).as(Seq("pos", "w")))
      .crossJoin(broadcast(lam))
      .select(col("pos"), round(col("w"), 6).as("loading"),
        round(col("__ev"), 6).as("eigval"))
  }

  /** Greedy k-center coreset (farthest-first traversal, Gonzalez
    * 1985): pick the lowest-id vector, then k−1 times the point
    * farthest (6dp squared Euclidean, ties → lowest id) from every
    * center chosen so far — the diversity sampler whose selections
    * 2-approximate the optimal k-center cover. The returned
    * `d_at_selection` sequence is non-increasing and IS the coverage
    * radius curve: stop where it elbows. The diversity complement to
    * frequency-weighted selection ([[graft.ops.Selection]] DSIR):
    * rare-region documents get picked FIRST here.
    *
    * Scale shape: each of the k rounds is one scan-side fold against
    * the newest center literal (the running min-distance column
    * carries forward, so round r compares against ONE new center, not
    * r), a MATERIALIZE to truncate lineage, and a driver collect of
    * exactly one (id, vector) row — k·dims doubles total, the bounded
    * pinned-centroid pattern. No corpus-sized sort: the argmax is a
    * TakeOrdered(1).
    */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val v = graft.data.ScopedCaches.materialize(
      df.select(col(idCol).cast("long").as("vid"),
        transform(col(vecCol), x => x.cast("double")).as("v")))
    def sqd(c: Array[Double]): Column =
      round(aggregate(
        zip_with(col("v"), typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0d), _ + _), 6)
    val first = v.orderBy(col("vid").asc).limit(1).collect().head
    var picked = Vector((1, first.getLong(0), 0.0))
    var dmin = v.select(col("vid"), col("v"),
      sqd(first.getSeq[Double](1).toArray).as("dmin"))
    for (r <- 2 to k) {
      val dC = graft.data.ScopedCaches.materialize(dmin)
      val sel = dC.orderBy(col("dmin").desc, col("vid").asc)
        .limit(1).collect().head
      picked :+= ((r, sel.getLong(0), sel.getDouble(2)))
      dmin = dC.select(col("vid"), col("v"),
        least(col("dmin"), sqd(sel.getSeq[Double](1).toArray))
          .as("dmin"))
    }
    val sp = df.sparkSession
    import sp.implicits._
    picked.toDF("sel_rank", "vec_id", "d_at_selection")
  }

  /** Histogram-based best-split finding — the inner loop of every
    * gradient-boosted-tree / decision-tree trainer (LightGBM's
    * histogram algorithm), run once per embedding dimension against a
    * binary target: bucket each dimension into `bins` equal-width bins
    * between its observed min/max, accumulate per-bin (count, positive)
    * cells, and scan the B−1 candidate thresholds per dimension for
    * the largest exact Gini-impurity decrease. Returns one row per
    * dimension: its best threshold, child counts, and gain.
    *
    * Scale shape: the classic two-pass histogram build. Pass 1 is a
    * per-dim min/max (combinable, d cells); pass 2 posexplodes each
    * vector but aggregates map-side into (dim, bin) cells, so only
    * d×B partials per task hit the shuffle — the explode itself never
    * does. The split scan is a cumulative window PER DIM over the
    * d×B-bounded cell table. Determinism: cells are exact integers;
    * the gain expression is a fixed-order double formula over them,
    * and per-dim argmax ties break on the lower bin.
    */
  def histSplitFinding(df: DataFrame, idCol: String, vecCol: String,
                       isPositive: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    import org.apache.spark.sql.expressions.Window
    val x = df.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")),
      when(isPositive, 1L).otherwise(0L).as("pos"))
    val stats = x.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val binned = x.join(broadcast(stats), Seq("dim"))
      .select(col("dim"), col("pos"),
        when(col("mx") > col("mn"),
          least(floor((col("x") - col("mn")) / (col("mx") - col("mn"))
            * bins).cast("int"), lit(bins - 1)))
          .otherwise(0).as("bin"))
    val cells = binned.groupBy(col("dim"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
    val wCum = Window.partitionBy(col("dim")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("dim"))
    val cum = cells
      .withColumn("nl", sum(col("n")).over(wCum))
      .withColumn("pl", sum(col("np")).over(wCum))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("pt", sum(col("np")).over(wAll))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("pr", col("pt") - col("pl"))
      .filter(col("nl") > 0 && col("nr") > 0)
    def g(p: Column, n: Column, tot: Column): Column =
      lit(2.0) * p * (n - p) / (n.cast("double") * tot)
    val gain = g(col("pt"), col("nt"), col("nt")) -
      g(col("pl"), col("nl"), col("nt")) -
      g(col("pr"), col("nr"), col("nt"))
    val wBest = Window.partitionBy(col("dim"))
      .orderBy(col("gain").desc, col("bin"))
    cum.join(broadcast(stats), Seq("dim"))
      .withColumn("gain", gain)
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("dim"),
        // pinned ×10⁶ BIGINT (not round(DOUBLE,6)) — DuckDB's round() on
        // DOUBLE differs in the last ulp across versions; exact integers
        // hash identically everywhere
        round((col("mn") + (col("bin") + 1) * (col("mx") - col("mn"))
          / bins) * 1e6).cast("long").as("split_x6"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"),
        round(col("gain") * 1e6).cast("long").as("gain6"))
  }

  /** Unbiased MMD² between two deterministic hash-halves of an
    * embedding table, under the QUADRATIC kernel k(x,y) = (1 + x·y)²
    * — a two-sample distribution-drift test over the vector space
    * itself ("did this snapshot's embedding distribution move"), the
    * multivariate companion to scalar PSI/KS drift. Zero in
    * expectation when both halves draw from the same distribution;
    * the poly-2 kernel matches all first and second moments (mean
    * vector + covariance), which is what embedding drift in practice
    * perturbs first.
    *
    * The quadratic kernel (not the RBF) is deliberate: k is then a
    * fixed-order polynomial of `vec_dot` — bit-identical across
    * engines — where exp() would put a libm ulp under every ×10⁹
    * pinning of the million-term sum. Each pinned term is an exact
    * BIGINT; the three pair-class sums are therefore summation-order-
    * free, and the final MMD² is one fixed-order double expression.
    *
    * Scale shape: the all-pairs join is the EXACT estimator, bounded
    * here by the embeddings table (n ≤ thousands per snapshot slice);
    * at 100 TB run it on [[Sampling.hashSample]]'d halves — the
    * estimator stays unbiased under uniform subsampling, plumbing
    * unchanged.
    */
  def mmdQuadraticSplit(df: DataFrame, idCol: String, vecCol: String,
                        salt: String = "mmd"): DataFrame = {
    val labeled = graft.data.ScopedCaches.track(
      Sampling.splitAssign(
        df.select(col(idCol).as("id"), col(vecCol).as("v")),
        "id", Seq("a" -> 0.5, "b" -> 0.5), salt))
    val l = labeled.select(col("id").as("id1"), col("v").as("v1"),
      col("split").as("s1"))
    val r = labeled.select(col("id").as("id2"), col("v").as("v2"),
      col("split").as("s2"))
    val dot = call_function("vec_dot", col("v1"), col("v2"))
    val kp = round((lit(1.0) + dot) * (lit(1.0) + dot) * lit(1.0e9))
      .cast("long")
    val sums = l.join(r, col("id1") < col("id2"))
      .select(col("s1"), col("s2"), kp.as("kp"))
      .agg(
        sum(when(col("s1") === "a" && col("s2") === "a", col("kp"))
          .otherwise(0L)).as("saa"),
        sum(when(col("s1") === "b" && col("s2") === "b", col("kp"))
          .otherwise(0L)).as("sbb"),
        sum(when(col("s1") =!= col("s2"), col("kp")).otherwise(0L))
          .as("sab"))
    val cnt = labeled.groupBy(col("split")).agg(count(lit(1)).as("c"))
      .agg(sum(when(col("split") === "a", col("c")).otherwise(0L)).as("m"),
        sum(when(col("split") === "b", col("c")).otherwise(0L)).as("n"))
    val mD = col("m").cast("double")
    val nD = col("n").cast("double")
    sums.crossJoin(broadcast(cnt))
      .select(col("m"), col("n"),
        round(lit(2.0) * (col("saa").cast("double") / 1.0e9) /
            (mD * (mD - 1.0)) +
          lit(2.0) * (col("sbb").cast("double") / 1.0e9) /
            (nD * (nD - 1.0)) -
          lit(2.0) * (col("sab").cast("double") / 1.0e9) / (mD * nD), 6)
          .as("mmd2"))
  }

  /** Participation ratio of the embedding covariance spectrum —
    * PR = trace(C)² / trace(C²) = (Σλ)²/Σλ² ∈ [1, d] — the whole-
    * spectrum effective-rank diagnostic. It answers "how many
    * dimensions does this embedding space actually use?" WITHOUT any
    * eigendecomposition: both traces are plain covariance-moment
    * aggregates (trace(C²) = Σᵢⱼ Cᵢⱼ² by symmetry), so unlike
    * [[pcaTopComponent]] (the top direction) or the LID estimator
    * (local dimension), this is exact, closed-form, and one pass.
    * PR ≈ d means isotropic use of the space; PR ≪ d is the
    * anisotropy/rank-collapse signal (embedding-collapse regressions,
    * over-whitening, dead dimensions).
    *
    * Exactness: every per-row product xᵢ·xⱼ is pinned to a ×10⁹
    * BIGINT before summing (the [[mmdQuadraticSplit]] discipline), so
    * the moment sums are summation-order-free; Cᵢⱼ is then ONE
    * fixed-order double expression re-pinned to ×10⁹, trace(C) sums
    * BIGINTs, and trace(C²) sums the squared pins in DECIMAL(38,0)
    * (≤ ~1e18 per cell — overflow-free to d ≈ 10⁴ at unit-scale
    * embeddings). Result: bit-identical replay in any engine.
    *
    * Scale shape: one scan emits the upper-triangular d(d+1)/2
    * products per row, but partial aggregation reduces every task to
    * ≤ d(d+1)/2 cells before the wire — the shuffle moves
    * O(tasks · d²) cells, never O(rows · d²); the d²-row covariance
    * table then folds to one row via two broadcast joins of the
    * d-row mean table. Linear in corpus size, no collect.
    */
  // No idCol parameter (unlike the sibling per-row diagnostics): the
  // statistic is corpus-global and only ever reads the vector column.
  def participationRatio(df: DataFrame, vecCol: String): DataFrame = {
    val x = df.select(col(vecCol).cast("array<double>").as("v"))
    val pairs = x.select(explode(flatten(transform(
      sequence(lit(1), size(col("v"))),
      i => transform(sequence(i, size(col("v"))),
        j => struct(i.as("i"), j.as("j"),
          round(element_at(col("v"), i) * element_at(col("v"), j) * 1e9)
            .cast("long").as("p9")))))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("p.p9").as("p9"))
    val sxy = pairs.groupBy(col("i"), col("j")).agg(sum(col("p9")).as("sxy9"))
    val sx = x.select(posexplode(col("v")).as(Seq("pos", "xv")))
      .groupBy((col("pos") + 1).as("k"))
      .agg(sum(round(col("xv") * 1e9).cast("long")).as("sx9"))
    val nd = x.agg(count(lit(1)).as("n"), max(size(col("v"))).as("d"))
    val n = col("n").cast("double")
    val c9 = round((col("sxy9").cast("double") / 1e9 / n -
      (col("a.sx9").cast("double") / 1e9 / n) *
        (col("b.sx9").cast("double") / 1e9 / n)) * 1e9).cast("long")
    val cells = sxy
      .join(broadcast(sx.as("a")), col("i") === col("a.k"))
      .join(broadcast(sx.as("b")), col("j") === col("b.k"))
      .crossJoin(broadcast(nd))
      .select(col("i"), col("j"), col("n"), col("d"), c9.as("c9"))
    val folded = cells.groupBy(col("n"), col("d")).agg(
      sum(when(col("i") === col("j"), col("c9")).otherwise(0L)).as("tr9"),
      sum(when(col("i") === col("j"), lit(1L)).otherwise(lit(2L))
        .cast("decimal(19,0)") * col("c9").cast("decimal(19,0)") *
        col("c9").cast("decimal(19,0)")).as("t2d"))
    val tr = col("tr9").cast("double") / 1e9
    val t2 = col("t2d").cast("double") / 1e18
    folded.select(col("d"), col("n"),
      round(tr, 6).as("trace_cov"),
      round(t2, 6).as("trace_cov2"),
      when(col("t2d") === 0, lit(null).cast("double"))
        .otherwise(round(tr * tr / t2, 6)).as("participation_ratio"),
      when(col("t2d") === 0, lit(null).cast("long"))
        .otherwise(round(tr * tr / t2 / col("d").cast("double") * 1e6)
          .cast("long")).as("effective_rank_ppm"))
  }
}

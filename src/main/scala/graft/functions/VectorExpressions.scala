package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions for the similarity operators.
  *
  * The composable `zip_with` + `aggregate` form (higher-order functions)
  * is interpreted per element and allocates a lambda frame per entry —
  * on an n^2 candidate stream of 64-dim vectors that dominates the whole
  * query. These expressions generate a tight primitive loop inside
  * whole-stage codegen instead (one pass, three accumulators), following
  * SURVEY.md §7's preference order: compose built-ins first, then a
  * custom `Expression` with `doGenCode` before any UDF. Registered via
  * [[graft.GraftExtensions]] (`SparkSessionExtensions.injectFunction`)
  * as `vec_dot` and `cosine_sim`.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def getter(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** `vec_dot(a, b)`: sum_i a_i * b_i over the common prefix length. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(x, i, fx) * get(y, i, fy); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(a, i, elemIsFloat(left))} * ${getter(b, i, elemIsFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `vec_l2sq(a, b)`: sum_i (a_i - b_i)^2 over the common prefix length
  * — the PQ-encode argmin metric. Numerically identical to the
  * `zip_with` diff + `vec_dot(diff, diff)` form it replaces (same
  * subtraction, same sequential accumulation), so oracles replaying
  * `list_dot_product(d, d)` over a comprehension diff are unaffected;
  * unlike that form it stays inside whole-stage codegen instead of
  * paying an interpreted lambda frame per element per codeword.
  */
case class L2Squared(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = get(x, i, fx) - get(y, i, fy)
      s += d * d; i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(a, i, elemIsFloat(left))} - ${getter(b, i, elemIsFloat(right))};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Kernel for [[PqEncode]] (object indirection keeps the generated code
  * a one-line call, like [[LshKernel]]). */
object PqEncodeKernel {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def encode(v: ArrayData, isFloat: Boolean, cb: Array[Double],
             m: Int, ksub: Int): ArrayData = {
    val sub = cb.length / (m * ksub)
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      var best = 0
      var bestS = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val base = (i * ksub + c) * sub
        var s = 0.0
        var j = 0
        while (j < sub) {
          val x = if (isFloat) v.getFloat(i * sub + j).toDouble
                  else v.getDouble(i * sub + j)
          val d = x - cb(base + j)
          s += d * d
          j += 1
        }
        // strict <: the FIRST minimum wins, i.e. smallest codeword index
        // on exact ties — the order an oracle's (s ASC, index ASC)
        // replays
        if (s < bestS) { bestS = s; best = c }
        c += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_encode(vec, codebook, m, ksub)`: product-quantization encode —
  * per subspace `i` of the input vector, the index of the codeword
  * minimizing squared L2 distance. `codebook` is a flattened
  * array<double> literal laid out `(i * ksub + c) * sub + j` with
  * `sub = dim / m`. One primitive loop inside whole-stage codegen per
  * row; the struct least()-fold + per-codeword round() form it
  * replaces paid m·ksub struct allocations and BigDecimal roundings
  * per corpus row — the pinned IVF-PQ encode hot path. Unrounded
  * argmin is engine-stable: both engines accumulate the same doubles
  * sequentially, so scores are bit-identical and exact ties break by
  * index on both sides.
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val codebook: Array[Double] = right match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        arr: ArrayData, ArrayType(DoubleType, _)) => arr.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"pq_encode codebook must be an array<double> literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _))
          if m >= 1 && ksub >= 1 && codebook.length % (m * ksub) == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double> vec, array<double> " +
          s"codebook literal with length divisible by m*ksub), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}, " +
          s"m=$m, ksub=$ksub")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cbIgnored: Any): Any =
    PqEncodeKernel.encode(v.asInstanceOf[ArrayData], isFloat, codebook, m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.PqEncodeKernel$$.MODULE$$" +
        s".encode($v, $isFloat, $cbRef, $m, $ksub);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Kernel for [[PqCodeDist]]. */
object PqCodeDistKernel {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def dists(v: ArrayData, isFloat: Boolean, cb: Array[Double],
            codes: ArrayData, ksub: Int): ArrayData = {
    val m = codes.numElements()
    val sub = if (m == 0) 0 else cb.length / (m * ksub)
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= ksub) out(i) = Double.PositiveInfinity
      else {
        val base = (i * ksub + c) * sub
        var s = 0.0
        var j = 0
        while (j < sub) {
          val x = if (isFloat) v.getFloat(i * sub + j).toDouble
                  else v.getDouble(i * sub + j)
          val d = x - cb(base + j)
          s += d * d
          j += 1
        }
        out(i) = s
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_code_dist(vec, codebook, codes, ksub)`: per subspace `i`, the
  * squared L2 distance from the vector's i-th slice to the codeword
  * `codes[i]` of the flattened `codebook` literal ([[PqEncode]]'s
  * layout; `m` comes from the codes array length). Out-of-range codes
  * yield +Inf, so an argmin-membership check fails them loudly. Built
  * for [[graft.ops.AnnCertify]]'s `code_argmin` certificate: the naive
  * form — m·ksub separate literal-array `vec_l2sq` calls — blows past
  * the whole-stage-codegen method budget (the [[LshKernel]] lesson) and
  * falls back to interpreted evaluation; one kernel call per row stays
  * codegen'd.
  */
case class PqCodeDist(first: Expression, second: Expression,
                      third: Expression, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val codebook: Array[Double] = second match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        arr: ArrayData, ArrayType(DoubleType, _)) => arr.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"pq_code_dist codebook must be an array<double> literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _),
          ArrayType(IntegerType, _)) if ksub >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double> vec, array<double> " +
          s"codebook literal, array<int> codes, ksub >= 1), got " +
          s"${first.dataType.catalogString}, " +
          s"${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}, ksub=$ksub")
    }

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cbIgnored: Any, codes: Any): Any =
    PqCodeDistKernel.dists(v.asInstanceOf[ArrayData], isFloat, codebook,
      codes.asInstanceOf[ArrayData], ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, codes) =>
      s"${ev.value} = graft.functions.PqCodeDistKernel$$.MODULE$$" +
        s".dists($v, $isFloat, $cbRef, $codes, $ksub);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression) = copy(first = f, second = s, third = t)
}

/** Shared sign-random-projection kernel: deterministic +-1 hyperplane
  * components from a splitmix-style hash of (planeIdx, dim index) — the
  * same bit stream for the interpreted path, the codegen path, and
  * [[graft.ops.Similarity.lshBucket]]'s literal-array form, so every
  * surface buckets identically. Plane matrices are memoized per
  * (planes, dim): building one bucket column from 256 literal-array
  * `vec_dot`s blows past the whole-stage-codegen method-size budget and
  * falls back to interpreted, boxed evaluation (~1 ms/row measured at
  * 32 tables x 8 planes); one kernel call over a cached primitive
  * matrix is ~100x cheaper and keeps the surrounding stage codegen'd.
  */
object LshKernel {
  def planeSign(planeIdx: Int, j: Int): Double = {
    var z = planeIdx.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(totalPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((totalPlanes, dim), { _ =>
      Array.tabulate(totalPlanes, dim)(planeSign)
    })

  /** All `tables` bucket ids of `vec` (table t uses planes
    * [t*numPlanes, (t+1)*numPlanes) — the same independent families as
    * chained [[graft.ops.Similarity.lshBucket]] calls).
    */
  def buckets(vec: ArrayData, isFloat: Boolean, tables: Int,
              numPlanes: Int): ArrayData = {
    val dim = vec.numElements()
    val m = planes(tables * numPlanes, dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val plane = m(t * numPlanes + p)
        var s = 0.0
        var j = 0
        if (isFloat) while (j < dim) { s += vec.getFloat(j) * plane(j); j += 1 }
        else while (j < dim) { s += vec.getDouble(j) * plane(j); j += 1 }
        if (s >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `lsh_buckets(vec, tables, numPlanes)`: array<int> of all independent
  * hash-table bucket ids in one kernel call per row.
  */
case class LshBuckets(child: Expression, tables: Int, numPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if tables >= 1 && numPlanes >= 1 && numPlanes <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, tables >= 1, 1 <= planes <= 30), " +
        s"got ${child.dataType.catalogString}, $tables, $numPlanes")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    LshKernel.buckets(v.asInstanceOf[ArrayData], isFloat, tables, numPlanes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshKernel$$.MODULE$$.buckets($c, $isFloat, $tables, $numPlanes)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `pq_adc(tbl, codes, ksub)`: asymmetric-distance lookup for product
  * quantization — `sum_i tbl[i * ksub + codes[i]]` over the m code
  * bytes of a row against a query's flattened m x ksub ADC table. The
  * higher-order `aggregate(sequence(...))` form this replaces is
  * interpreted per element with a boxed lambda frame per code; this is
  * a tight primitive loop inside whole-stage codegen — the ADC scan is
  * the one per-corpus-row stage of [[graft.ops.Similarity.pqTopK]], so
  * it is exactly the loop that must not fall out of codegen.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) if ksub >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double> table, array<int> codes, ksub >= 1), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}, $ksub")
  }

  override def nullSafeEval(t: Any, c: Any): Any = {
    val tbl = t.asInstanceOf[ArrayData]; val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0; var i = 0
    while (i < m) { s += tbl.getDouble(i * ksub + codes.getInt(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $m = $c.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $t.getDouble($i * $ksub + $c.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `cosine_sim(a, b)`: one pass accumulating dot, |a|^2, |b|^2 —
  * numerically identical to dot/sqrt(na*nb) with sequential summation
  * (what the DuckDB oracle computes on DOUBLE[]).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = get(x, i, fx); val yv = get(y, i, fy)
      d += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    d / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getter(a, i, elemIsFloat(left))};
         |  double $yv = ${getter(b, i, elemIsFloat(right))};
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $d / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

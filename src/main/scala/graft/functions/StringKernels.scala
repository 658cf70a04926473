package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar string-similarity kernels shared by interpreted eval and
  * generated code. A top-level Scala object emits JVM static forwarders,
  * so whole-stage-codegen'd Java can call
  * `graft.functions.StringKernels.jaroWinkler(a, b)` directly — the same
  * pattern as Spark's own `levenshtein`, which generates a call into
  * `UTF8String.levenshteinDistance`.
  */
object StringKernels {

  /** Jaro–Winkler similarity over the raw UTF-8 BYTES of the two
    * strings (prefix scale 0.1 capped at 4, Winkler boost only when the
    * Jaro score exceeds 0.7 — the reference parameterization, verified
    * against DuckDB's `jaro_winkler_similarity` which this matches
    * byte-for-byte, including its byte-level treatment of multi-byte
    * code points; on ASCII the distinction vanishes). Either side empty
    * scores 0. O(|a|·window) time, two boolean scratch arrays.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val hi = math.min(n2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched bytes of both strings in order;
    // t counts positional disagreements (each swap contributes 2)
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val jaro = (mD / n1 + mD / n2 + (mD - t / 2.0) / mD) / 3.0
    var l = 0
    val lMax = math.min(4, math.min(n1, n2))
    while (l < lMax && s1(l) == s2(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  /** TRUE Damerau–Levenshtein distance over raw UTF-8 bytes — the
    * Lowrance–Wagner algorithm with the last-occurrence table, so a
    * transposition of ADJACENT symbols costs 1 even when later edits
    * interleave (DuckDB's `damerau_levenshtein` is this unrestricted
    * variant, probe-verified: ("ca","abc") = 2, where the common OSA
    * restriction gives 3). O(|a|·|b|) time AND space — run it on
    * dictionary-sized value tables (the record-linkage use), never on
    * document bodies.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0) return n2
    if (n2 == 0) return n1
    val inf = n1 + n2
    val h = Array.ofDim[Int](n1 + 2, n2 + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= n1) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n2) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val last = new Array[Int](256)
    i = 1
    while (i <= n1) {
      var db = 0
      j = 1
      while (j <= n2) {
        val i1 = last(s2(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (s1(i - 1) == s2(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val trn = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trn))
        j += 1
      }
      last(s1(i - 1) & 0xff) = i
      i += 1
    }
    h(n1 + 1)(n2 + 1)
  }
}

/** `jaro_winkler(a, b)`: byte-level Jaro–Winkler similarity in [0, 1].
  * A native expression rather than a UDF so the fuzzy-verification scan
  * stays inside whole-stage codegen (the generated code is a single
  * static call, no boxing, no encoder round-trip). Registered via
  * [[graft.GraftExtensions]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType.isInstanceOf[StringType]
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `damerau_levenshtein(a, b)`: unrestricted Damerau–Levenshtein edit
  * distance (adjacent transposition = 1 edit) over UTF-8 bytes — the
  * record-linkage metric for transposition typos that plain
  * `levenshtein` double-charges. Native for the same codegen reasons as
  * [[JaroWinkler]]. Registered via [[graft.GraftExtensions]].
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType.isInstanceOf[StringType]
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.damerauLevenshtein(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

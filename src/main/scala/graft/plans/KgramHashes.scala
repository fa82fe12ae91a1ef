package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window Rabin–Karp k-gram hashes over a string column —
  * the codegen'd fast path for [[graft.functions.Text.kgramHashes]].
  *
  * Why a custom Expression (justified by measurement, like [[DotProduct]]):
  * the higher-order form evaluates an O(k) fold per window → O(len·k)
  * interpreted work per row, and it dominates the deterministic-minhash
  * dedup and winnowing queries. This expression slides the window —
  * poly' = (poly − c_out·B^(k−1))·B + c_in (mod p) — for O(len) total,
  * inside WholeStageCodegen.
  *
  * Bit-identical to the HOF form on ANY input: window value
  * = (7·B^k + Σ c_i·B^(k−1−i)) mod p with B=31, p=2³¹−1, c_i the
  * CODEPOINTS of the window — Spark's `length`/`substr`/`split` (the HOF
  * building blocks) are all codepoint-based, so the native loop decodes
  * the string to a codepoint array first (r13 was UTF-16-unit-based and
  * bit-identical only on BMP input; the normalized-text domain is ASCII,
  * but the contract is now domain-free — NativeExprPropertySpec fuzzes
  * it across astral planes). Inputs shorter than k CODEPOINTS yield an
  * empty array; null input yields null.
  */
case class KgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        // k ≤ 0 would silently diverge from the HOF twin (which yields
        // len+1 seed-fold hashes at k = 0 where this yields []): reject a
        // non-positive foldable k at analysis time rather than diverge
        if (right.foldable) {
          val k = right.eval()
          if (k == null || k.asInstanceOf[Int] <= 0)
            TypeCheckResult.TypeCheckFailure(
              s"graft_kgrams requires a positive k, got $k")
          else TypeCheckResult.TypeCheckSuccess
        } else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_kgrams requires (string, int) inputs, got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_kgrams"

  override protected def nullSafeEval(s: Any, kAny: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val k = kAny.asInstanceOf[Int]
    UnsafeArrayData.fromPrimitiveArray(KgramHashes.compute(str, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.plans.KgramHashes.compute($a.toString(), $b);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KgramHashes {
  private final val P = 2147483647L
  private final val B = 31L
  private final val Seed = 7L

  /** Shared by interpreted eval and codegen (one tight JIT-compiled loop —
    * a per-call static method keeps the generated code tiny). Slides over
    * CODEPOINTS (the HOF twin's substr/length unit); the decode pass is
    * O(len) like the slide itself. */
  def compute(s: String, k: Int): Array[Long] = {
    if (k <= 0) return Array.emptyLongArray
    val cps = codePointsOf(s)
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    var bPow = 1L
    var i = 0
    while (i < k - 1) { bPow = bPow * B % P; i += 1 }
    var seedTerm = Seed
    i = 0
    while (i < k) { seedTerm = seedTerm * B % P; i += 1 }
    var poly = 0L
    i = 0
    while (i < k) { poly = (poly * B + cps(i)) % P; i += 1 }
    val out = new Array[Long](n - k + 1)
    out(0) = (seedTerm + poly) % P
    i = 1
    while (i <= n - k) {
      poly = ((poly - cps(i - 1) * bPow % P + P) % P * B + cps(i + k - 1)) % P
      out(i) = (seedTerm + poly) % P
      i += 1
    }
    out
  }

  /** Codepoint array of `s` (surrogate pairs decode to one element, the
    * unit Spark's string expressions operate in). */
  private[plans] def codePointsOf(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var o = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(o) = cp
      o += 1
      i += Character.charCount(cp)
    }
    out
  }
}

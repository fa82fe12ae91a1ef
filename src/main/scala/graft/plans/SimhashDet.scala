package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 62-bit deterministic SimHash — the fast path for
  * [[graft.functions.Text.simhashDet]].
  *
  * Why (measurement-justified, like [[DotProduct]]/[[KgramHashes]]): the
  * HOF form folds a 62-element vote array per token with two fresh
  * 31-`when` sign arrays per element — all CodegenFallback-interpreted.
  * This expression is one tight loop per row.
  *
  * Bit-identical semantics to the HOF on any input, pinned by tests and
  * fuzzed by NativeExprPropertySpec:
  * tokens = `split(trim(c), "\s+")` where trim strips ASCII SPACES only
  * (not tabs/newlines — Spark's StringTrim) and split keeps leading AND
  * trailing empty tokens (Spark's split uses limit −1, unlike Java's
  * default); per-token Rabin–Karp hash (seed 7, base 31, mod 2³¹−1) over
  * CODEPOINTS (the HOF's `split(t, "")`/`ascii` unit — r13 hashed UTF-16
  * units, which diverged from the HOF on astral-plane tokens); two
  * affine diffusion lanes vote ±1 per bit; bit i set iff its vote sum is
  * strictly positive.
  */
case class SimhashDet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires a string input, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(s: Any): Any =
    SimhashDet.compute(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimhashDet.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashDet {
  private final val P = 2147483647L
  private final val B = 31L
  private final val Seed = 7L
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Strip ASCII spaces only, both ends — Spark's `trim` semantics
    * (Java's String.trim also removes tabs/newlines, which would change
    * the token list). */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Spark-semantics tokenizer shared by both simhash variants:
    * ASCII-space-only trim, split with limit −1 (keeps trailing empties). */
  private[plans] def tokenize(raw: String): Array[String] =
    Ws.split(trimSpaces(raw), -1)

  def compute(raw: String): Long = {
    val tokens = tokenize(raw)
    val votes = new Array[Int](62)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      var h = Seed
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h = (h * B + cp) % P
        i += Character.charCount(cp)
      }
      val h1 = (h * 1103515245L + 12345L) % P
      val h2 = (h * 69069L + 362437L) % P
      i = 0
      while (i < 31) {
        votes(i) += (if (((h1 >>> i) & 1L) == 1L) 1 else -1)
        votes(i + 31) += (if (((h2 >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 62) {
      if (votes(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }
}

/** Native codegen'd 64-bit SEEDED SimHash — the fast path for
  * [[graft.functions.Text.simhash64]] (the xxhash64-token variant that
  * twins MLlib-style seeded hashing; the deterministic [[SimhashDet]]
  * is the oracle-able one).
  *
  * Bit-identical to the HOF form: tokens via the same ASCII-space trim +
  * limit−1 split, per-token hash = Spark's own `xxhash64(token, 42)`
  * (delegated to catalyst's XxHash64Function, so byte-for-byte the same
  * value the HOF computes), 64 ±1 votes per token, bit i set iff its
  * vote sum is strictly positive. The HOF folds a 64-element vote array
  * per token with a fresh 64-`when` sign array each — interpreted; this
  * is one tight loop per row.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 requires a string input, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(s: Any): Any =
    Simhash64.compute(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Simhash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64 {
  def compute(raw: String): Long = {
    val tokens = SimhashDet.tokenize(raw)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(tokens(t)),
        org.apache.spark.sql.types.StringType, 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }
}

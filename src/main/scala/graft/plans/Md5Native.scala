package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-derived integer hashes — the codegen'd fast path for the
  * engine-portable hash contract every sketch operator shares:
  *
  *   md5Long:   conv(substring(md5(c), 1, 15), 16, 10)          (60 bits)
  *   md5Chunks: [conv(substring(md5(c), 1+7j, 7), 16, 10)]_j<4  (4 × 28 bits)
  *
  * Why native (r17, measured): the composed form materializes a 32-char
  * lowercase-hex STRING per row (Spark's `Md5` allocates the digest, the
  * hex encoding, and a UTF8String), then `substring` copies a slice and
  * `conv` PARSES it back to a long via string arithmetic — per row, per
  * chunk (the count-min/bloom builds extract four chunks from one digest,
  * paying substring+conv four times). These expressions compute the MD5
  * once (thread-local MessageDigest — commons-codec's DigestUtils inside
  * Spark's Md5 allocates a fresh one per call) and assemble the integer
  * values directly from the digest bytes: no hex string, no substring
  * copies, no conv parses, one small allocation (the 4-long array) at
  * most.
  *
  * Bit-identical by construction: hex digit h of the digest is the
  * high/low nibble of byte h/2, and `conv(hex, 16, 10)` of k ≤ 15 digits
  * is exactly the big-endian nibble fold — NativeExprPropertySpec fuzzes
  * both equivalences (unicode strings through a parquet round-trip so
  * codegen runs). The DuckDB oracles keep spelling the portable
  * `('0x' || substr(md5(x), …))::BIGINT` form; the oracle hash gate pins
  * cross-engine equality.
  *
  * Input is BinaryType (callers keep the existing `c.cast("binary")` —
  * for strings that cast is the UTF-8 bytes, byte-identical to what
  * DuckDB's `md5(VARCHAR)` hashes); StringType is accepted directly for
  * convenience and hashes the same UTF-8 bytes.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_long requires a binary or string input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long"

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any =
    if (isString) Md5Native.md5Long(v.asInstanceOf[UTF8String].getBytes)
    else Md5Native.md5Long(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, c => s"graft.plans.Md5Native.md5Long($c.getBytes())")
    else
      defineCodeGen(ctx, ev, c => s"graft.plans.Md5Native.md5Long($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The four disjoint 28-bit md5 chunks as `array<long>` (element j+1 =
  * hex digits 1+7j … 7+7j, 1-based — the count-min/bloom hash family).
  * See [[Md5Long]] for the rationale and equivalence argument. */
case class Md5Chunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_chunks requires a binary or string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_chunks"

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any = {
    val bytes =
      if (isString) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]]
    UnsafeArrayData.fromPrimitiveArray(Md5Native.md5Chunks(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesExpr: String => String =
      if (isString) c => s"$c.getBytes()" else c => c
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} =
       |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
       |    graft.plans.Md5Native.md5Chunks(${bytesExpr(c)}));
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Native {

  /** Thread-local digest: `MessageDigest.getInstance` allocates per call;
    * tasks are thread-bound, so one instance per executor thread amortizes
    * it to a `reset()`. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def digest(input: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(input)
  }

  /** Value of hex digits [from, from+len) (0-based) of the digest — the
    * big-endian nibble fold `conv(substr(hex, from+1, len), 16, 10)`
    * computes. len ≤ 15 keeps the value inside a positive long. */
  private def hexWindow(dig: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L
    var h = from
    val end = from + len
    while (h < end) {
      val b = dig(h >> 1) & 0xFF
      val nibble = if ((h & 1) == 0) b >>> 4 else b & 0xF
      v = (v << 4) | nibble
      h += 1
    }
    v
  }

  def md5Long(input: Array[Byte]): Long = hexWindow(digest(input), 0, 15)

  def md5Chunks(input: Array[Byte]): Array[Long] = {
    val dig = digest(input)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      out(j) = hexWindow(dig, 7 * j, 7)
      j += 1
    }
    out
  }
}

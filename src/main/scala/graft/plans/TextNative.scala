package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text normalization — the codegen'd fast path for
  * [[graft.functions.Text.normalized]]:
  *
  *   trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
  *
  * Why a custom Expression (r17, justified by measurement): the composed
  * form is FOUR full passes per row — a lowercase copy, two Java-regex
  * replaces (each allocating an intermediate string), and a trim — and it
  * sits at the head of every text operator in the registry (the minhash
  * dedup family, fingerprint dedup tiers, repetition, winnowing,
  * decontamination, source overlap, the BPE/WordPiece vocabularies). This
  * expression does the whole chain in ONE pass over the bytes with one
  * output allocation.
  *
  * Bit-identical on ANY input (NativeExprPropertySpec fuzzes across astral
  * planes):
  *  - pure-ASCII inputs take a byte loop: A–Z +32, every byte outside
  *    [a-z0-9] becomes a space, space runs collapse, leading/trailing
  *    spaces drop — exactly the composed chain's semantics on ASCII.
  *  - any non-ASCII input falls back to `UTF8String.toLowerCase()` (the
  *    SAME method Spark's `Lower` calls under the default UTF8_BINARY
  *    collation) followed by a codepoint loop applying the identical
  *    keep/space/collapse/trim rules (Java regex `[^a-z0-9 ]` matches per
  *    CODEPOINT, so an astral char maps to ONE space — the loop works in
  *    codepoints for the same reason KgramHashes does).
  */
case class Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string input, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(s: Any): Any =
    Normalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Normalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Normalize {

  /** One-pass normalize; shared by interpreted eval and codegen. */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Byte](bytes.length)
      var o = 0
      var pendingSpace = false
      i = 0
      while (i < bytes.length) {
        var c = bytes(i)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
          pendingSpace = false
          out(o) = c
          o += 1
        } else pendingSpace = true // space or any other char → collapsed space
        i += 1
      }
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
    } else {
      // non-ASCII fallback: Spark's own lowercase (identical by
      // construction), then the same keep/space/collapse/trim over
      // CODEPOINTS (the regex `[^a-z0-9 ]` unit)
      val t = s.toLowerCase.toString
      val sb = new java.lang.StringBuilder(t.length)
      var pendingSpace = false
      i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.appendCodePoint(cp)
        } else pendingSpace = true
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Fused deterministic-minhash signature — the codegen'd fast path for
  *
  *   Text.minhashSignatures(array_distinct(Text.kgramHashesNative(norm, k)), numHashes)
  *
  * i.e. element j = min over all k-gram rolling hashes h of
  * (h·(1 + j·1299721) + 7 + j·104729) mod (2³¹−1).
  *
  * Why fused (r17, measured): the composed form materializes the k-gram
  * hash array (len-k+1 longs per row), a distinct copy, and then
  * `numHashes` MORE transformed arrays, each reduced by array_min — per
  * document. The minima are duplicate-insensitive, so the distinct is a
  * no-op for the RESULT and the whole thing folds into one sliding-window
  * pass keeping `numHashes` running minima: zero array allocations besides
  * the 12-element output. Bit-identical on any input; inputs shorter than
  * k codepoints yield an array of `numHashes` nulls exactly like
  * `array_min` over the empty shingle array (callers filter those rows
  * out; the fuzz spec pins the corner anyway).
  */
case class MinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        def bad(e: Expression, name: String): Option[String] =
          if (e.foldable) {
            val v = e.eval()
            if (v == null || v.asInstanceOf[Int] <= 0)
              Some(s"graft_minhash_sig requires a positive $name, got $v")
            else None
          } else None
        bad(second, "k").orElse(bad(third, "numHashes"))
          .map(TypeCheckResult.TypeCheckFailure)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig requires (string, int, int) inputs, got $a, $b, $c")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(s: Any, kAny: Any, nAny: Any): Any =
    MinhashSig.compute(s.asInstanceOf[UTF8String].toString,
      kAny.asInstanceOf[Int], nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
       |${ev.value} = graft.plans.MinhashSig.compute($a.toString(), $b, $c);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinhashSig {
  private final val P = 2147483647L
  private final val B = 31L
  private final val Seed = 7L

  def compute(s: String, k: Int, numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (k <= 0 || numHashes <= 0)
      throw new IllegalArgumentException(
        s"graft_minhash_sig requires positive k/numHashes, got $k/$numHashes")
    val cps = KgramHashes.codePointsOf(s)
    val n = cps.length
    if (n < k) // array_min over the empty shingle array is null per element
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    val mins = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      as(j) = 1L + j * 1299721L
      bs(j) = 7L + j * 104729L
      mins(j) = Long.MaxValue
      j += 1
    }
    // identical window-hash recurrence to KgramHashes.compute
    var bPow = 1L
    var i = 0
    while (i < k - 1) { bPow = bPow * B % P; i += 1 }
    var seedTerm = Seed
    i = 0
    while (i < k) { seedTerm = seedTerm * B % P; i += 1 }
    var poly = 0L
    i = 0
    while (i < k) { poly = (poly * B + cps(i)) % P; i += 1 }
    var h = (seedTerm + poly) % P
    j = 0
    while (j < numHashes) {
      val v = (h * as(j) + bs(j)) % P
      if (v < mins(j)) mins(j) = v
      j += 1
    }
    i = 1
    while (i <= n - k) {
      poly = ((poly - cps(i - 1) * bPow % P + P) % P * B + cps(i + k - 1)) % P
      h = (seedTerm + poly) % P
      j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Fused k-gram repetition stats — the codegen'd fast path for
  *
  *   [size(g), size(array_distinct(g))] with g = Text.kgramHashesNative(norm, k)
  *
  * returning `array(n_grams, n_distinct)` as longs. Why fused (r17,
  * measured): the composed form materializes the gram array AND a
  * distinct copy per document just to count them — the Gopher-style
  * repetition filter only needs the two counts. One sliding-window pass
  * feeding an open-addressing long set; the only allocation is the set.
  * Inputs shorter than k yield [0, 0] (size of the empty array), matching
  * the HOF twin.
  */
case class KgramStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (right.foldable) {
          val k = right.eval()
          if (k == null || k.asInstanceOf[Int] <= 0)
            TypeCheckResult.TypeCheckFailure(
              s"graft_kgram_stats requires a positive k, got $k")
          else TypeCheckResult.TypeCheckSuccess
        } else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kgram_stats requires (string, int) inputs, got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kgram_stats"

  override protected def nullSafeEval(s: Any, kAny: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      KgramStats.compute(s.asInstanceOf[UTF8String].toString, kAny.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.plans.KgramStats.compute($a.toString(), $b);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KgramStats {
  def compute(s: String, k: Int): Array[Long] = {
    val grams = KgramHashes.compute(s, k)
    val n = grams.length
    if (n == 0) return Array(0L, 0L)
    // open-addressing long set, power-of-2 capacity ≥ 2n (values are
    // non-negative rolling hashes; -1 is a safe empty sentinel)
    var cap = java.lang.Integer.highestOneBit(math.max(4, n * 2 - 1)) << 1
    if (cap < 4) cap = 4
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val mask = cap - 1
    var distinct = 0L
    var i = 0
    while (i < n) {
      val v = grams(i)
      // 64-bit mix (splitmix64 finalizer) to spread the dense hash runs
      var x = v
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^= x >>> 31
      var slot = (x & mask).toInt
      var done = false
      while (!done) {
        val cur = table(slot)
        if (cur == v) done = true
        else if (cur == -1L) { table(slot) = v; distinct += 1; done = true }
        else slot = (slot + 1) & mask
      }
      i += 1
    }
    Array(n.toLong, distinct)
  }
}

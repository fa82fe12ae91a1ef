package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused sign-LSH bucket key over an `array<double>` embedding, in ONE
  * codegen'd loop per table:
  *
  *   - bits `0 until baseBits`: hyperplane signs against a FLAT plane
  *     matrix (row-major, `baseBits × dims` doubles) — the same
  *     sequential d-order fold as [[DotProduct]] (bit-identical doubles),
  *     compared `> 0.0`.
  *   - bits beyond baseBits: axis-pair difference signs
  *     `emb[a] > emb[b]` from `widenPairs` (flattened (a, b) pairs, one
  *     per widening bit) — the O(1)-cost key widening of the adaptive ANN
  *     family.
  *
  * Why a custom Expression (two r10 measurements):
  *   1. Composing the base key from per-bit [[DotProduct]] expressions
  *      inlined 16 tables × bits 64-iteration loops into one generated
  *      `doConsume` — past Janino's 64 KB method limit, dropping the
  *      whole signature scan (the ANN family's dominant cost) to
  *      interpreted evaluation (`InternalCompilerException: Code grows
  *      beyond 64 KB` in the sf100 probe log; 670 s → 11 s at sf100 once
  *      fused).
  *   2. Widening with per-bit `when(element_at …)` Catalyst expressions
  *      kept the plan inside WholeStageCodegen yet ran 160× slower than
  *      the 4-bit scan (65 s vs 0.4 s at sf10, SigWidthProbe) — the
  *      generated Generate method grows past what HotSpot will optimize,
  *      and Spark cannot split expression code inside a Generate's
  *      consume path. Folding the widening bits INTO this expression
  *      keeps each table's whole key in one small, JIT-friendly method.
  *
  * Semantics mirror the composed form EXACTLY where the oracled gadget
  * lives (widenPairs empty): a length-mismatched embedding made every
  * per-bit dot null, so every `when(dot > 0, bit).otherwise(0)`
  * contributed 0 and the key summed to 0 — here a mismatch (or a null
  * embedding) likewise yields key 0 for ALL bits, never null. The
  * oracled q_ann_lsh_det keeps its DuckDB SQL untouched: this changes
  * the plan, not one output byte (Verify hash-gates that).
  *
  * Sign comparisons use SPARK's double ordering (NaN greater than
  * everything, ±0.0 equal — `nanSafeCompareDoubles`, the same code
  * Catalyst generates for `>`), not Java primitive `>` (r14: the
  * NativeExprPropertySpec fuzz domain includes NaN/±Inf embeddings,
  * where Java `NaN > 0` = false would split the fused key from the
  * composed form — and from the DuckDB oracle, whose comparison also
  * totals NaN last). Finite embeddings, the production domain, are
  * bit-for-bit unaffected.
  */
case class SignBucketKey(child: Expression, planes: Array[Double],
                         baseBits: Int, widenPairs: Array[Int] = Array.empty)
    extends UnaryExpression {

  require(baseBits > 0 && baseBits + widenPairs.length / 2 <= 63,
    s"key width must be in 1..63, got $baseBits + ${widenPairs.length / 2}")
  require(planes.length % baseBits == 0,
    s"plane matrix length ${planes.length} not divisible by baseBits=$baseBits")
  require(widenPairs.length % 2 == 0, "widenPairs must be flattened (a, b) pairs")
  private val dims = planes.length / baseBits

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_key requires an array<double> input, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sign_key"

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) 0L
    else {
      val x = a.asInstanceOf[ArrayData]
      if (x.numElements() != dims) 0L
      else {
        var key = 0L
        var w = 0
        while (w < baseBits) {
          var acc = 0.0
          val base = w * dims
          var d = 0
          while (d < dims) {
            acc += x.getDouble(d) * planes(base + d)
            d += 1
          }
          if (SignBucketKey.nanCmp(acc, 0.0) > 0) key |= 1L << w
          w += 1
        }
        var p = 0
        while (p < widenPairs.length) {
          if (SignBucketKey.nanCmp(x.getDouble(widenPairs(p)),
              x.getDouble(widenPairs(p + 1))) > 0)
            key |= 1L << (baseBits + p / 2)
          p += 2
        }
        key
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val pairsRef = ctx.addReferenceObj("widenPairs", widenPairs, "int[]")
    val key = ctx.freshName("key")
    val w = ctx.freshName("w")
    val d = ctx.freshName("d")
    val p = ctx.freshName("p")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      long $key = 0L;
      if (!${c.isNull} && ${c.value}.numElements() == $dims) {
        for (int $w = 0; $w < $baseBits; $w++) {
          double $acc = 0.0;
          int $base = $w * $dims;
          for (int $d = 0; $d < $dims; $d++) {
            $acc += ${c.value}.getDouble($d) * $planesRef[$base + $d];
          }
          if (graft.plans.SignBucketKey.nanCmp($acc, 0.0) > 0) $key |= 1L << $w;
        }
        for (int $p = 0; $p < ${widenPairs.length}; $p += 2) {
          if (graft.plans.SignBucketKey.nanCmp(${c.value}.getDouble($pairsRef[$p]),
              ${c.value}.getDouble($pairsRef[$p + 1])) > 0)
            $key |= 1L << ($baseBits + $p / 2);
        }
      }
      long ${ev.value} = $key;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucketKey {
  /** Spark's double comparison (`Utils.nanSafeCompareDoubles` — NaN
    * greater than any value and equal to itself, ±0.0 equal), reproduced
    * here because `org.apache.spark.util.Utils` is `private[spark]` to
    * Scala code; a Scala object method gets a static forwarder on the
    * companion class, so the generated Java calls it directly. */
  def nanCmp(x: Double, y: Double): Int = {
    val xNaN = java.lang.Double.isNaN(x)
    val yNaN = java.lang.Double.isNaN(y)
    if ((xNaN && yNaN) || x == y) 0
    else if (xNaN) 1
    else if (yNaN) -1
    else if (x > y) 1
    else -1
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level embedding math over `array<float>`/`array<double>` columns.
  *
  * All accumulation is a sequential left fold in array order over doubles
  * (`aggregate` + `zip_with`) — deterministic per row, bit-comparable to
  * DuckDB's list_dot_product, and fully codegen'd (no UDFs).
  */
object Vectors {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Dot product in double precision (portable higher-order-function
    * form — works on any session; see [[dotNative]] for the fast path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product via the native [[graft.plans.DotProduct]]
    * expression — bit-identical results to [[dot]], ~2× faster (the HOF
    * form is CodegenFallback). Requires the session to be built with
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** L2 norm on the native fast path. */
  def normNative(c: Column): Column = sqrt(dotNative(c, c))

  /** L2 norm. */
  def norm(c: Column): Column = sqrt(dot(c, c))

  /** Cosine similarity, written exactly as dot/(sqrt(dot)·sqrt(dot)) so the
    * expression shape (and therefore the float result) matches the oracle's.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
}

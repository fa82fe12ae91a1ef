package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, key) candidate for [[TopKByPrice]] — integer cents so the
  * ordering and the emitted values are engine-exact. */
final case class PricedRow(cents: Long, key: Long)

/** Typed top-k-per-group aggregate — the map-side-combine alternative to a
  * `row_number` window for per-group leaderboards. A window sorts and
  * shuffles EVERY row of every group; this Aggregator's partial buffers
  * never hold more than k rows per group per task, so the shuffle carries
  * O(groups × k) rows regardless of corpus size — at 100 TB the difference
  * between "shuffle the fact table" and "shuffle a leaderboard".
  *
  * The buffer is a sorted bounded list (cents descending, key ascending as
  * the deterministic tie-break); merge is associative and commutative, so
  * the result is identical under any partitioning — the property that lets
  * the emitted leaderboard hash-match a sequential window oracle.
  */
object TopKByPrice extends Aggregator[PricedRow, Seq[PricedRow], Seq[PricedRow]] {
  val k = 3
  private val ord: Ordering[PricedRow] =
    Ordering.by((r: PricedRow) => (-r.cents, r.key))
  override def zero: Seq[PricedRow] = Vector.empty
  override def reduce(buf: Seq[PricedRow], v: PricedRow): Seq[PricedRow] =
    merge(buf, Vector(v))
  override def merge(a: Seq[PricedRow], b: Seq[PricedRow]): Seq[PricedRow] =
    (a ++ b).sorted(ord).take(k)
  override def finish(buf: Seq[PricedRow]): Seq[PricedRow] = buf
  override def bufferEncoder: Encoder[Seq[PricedRow]] = ExpressionEncoder[Seq[PricedRow]]()
  override def outputEncoder: Encoder[Seq[PricedRow]] = ExpressionEncoder[Seq[PricedRow]]()
}

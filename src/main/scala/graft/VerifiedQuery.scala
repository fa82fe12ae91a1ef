package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified operator: a Spark DataFrame builder plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB SQL string the driver runs
  * as the correctness oracle (SURVEY §5.1).
  *
  * Oracle-parity rules used across the engine (hard-won, see SURVEY §7.4):
  *  - Column names must match between the Spark result and the SQL — every
  *    computed column is aliased identically on both sides.
  *  - Floating outputs are derived from integer-exact aggregates (sums over
  *    cents as BIGINT) wherever possible, so both engines produce
  *    bit-identical doubles regardless of per-partition summation order.
  *  - Remaining order-dependent aggregates (averages over doubles) are
  *    rounded to 6 decimals on both sides.
  *  - Timestamps in outputs are formatted to strings or cast to epoch
  *    integers to dodge parquet physical-type mismatches.
  */
final case class VerifiedQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object VerifiedQuery {
  /** Registry helper: turn a module's query list into the SparkEntry maps. */
  def toQueryMap(qs: Seq[VerifiedQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.build).toMap
  def toOracleMap(qs: Seq[VerifiedQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

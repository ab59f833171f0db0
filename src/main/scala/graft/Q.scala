package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query plus (usually) an equivalent
  * DuckDB oracle SQL. `oracle = None` → the driver records a rows-only check
  * (used for ops not expressible in portable SQL, e.g. the external pipe).
  *
  * Contract (builder prompt): output column names must match between the
  * Spark result and the oracle SQL — the driver sorts columns by name and
  * hash-compares values. Every float column is rounded on BOTH sides; every
  * query ends with a deterministic ORDER BY on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

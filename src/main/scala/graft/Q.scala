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
    oracle: Option[String],
    dynOracle: Option[(SparkSession, String) => String] = None)

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** A query whose oracle SQL must be RENDERED against the run's data dir
    * (e.g. tokenizer application: the learned merge/piece table is
    * interpolated as a VALUES list, and DuckDB re-applies it to the corpus
    * independently). The generator runs at Verify time, so the training
    * half stays spec-verified while the application half gets a true
    * cross-engine hash check. */
  def dynamic(name: String)(fn: (SparkSession, String) => DataFrame)(
      gen: (SparkSession, String) => String): Q =
    Q(name, fn, None, Some(gen))
}

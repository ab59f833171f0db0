package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface (SURVEY.md §1.2: case-class rows where
  * compile-time field checks help): groupByKey + mapGroups with exact
  * integer accumulation, matching the untyped/SQL oracle. */
object TypedQueries {

  case class Line(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)
  case class FlagStats(l_returnflag: String, n: Long, qty_sum: Long, price_cents: Long)

  private val q41 = Q(
    "q41_typed_dataset",
    """SELECT l_returnflag,
              count(*) AS n,
              CAST(sum(l_quantity) AS BIGINT) AS qty_sum,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[Line]
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var qty = 0L; var cents = 0L
        rows.foreach { r =>
          n += 1
          qty += math.round(r.l_quantity) // fixture quantities are integral
          cents += math.round(r.l_extendedprice * 100)
        }
        FlagStats(flag, n, qty, cents)
      }
      .toDF()
      .orderBy("l_returnflag")
  }

  val defs: Seq[Q] = Seq(q41)
}

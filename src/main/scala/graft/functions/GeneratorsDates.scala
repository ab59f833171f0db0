package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generator functions (posexplode / explode_outer), the extended
  * date-part family, and the typed joinWith surface. */
object GeneratorsDates {

  /** posexplode: token with 0-based position (first 20 docs). */
  private val q48 = Q(
    "q48_posexplode",
    """SELECT doc_id, i - 1 AS pos, ws[i] AS token
       FROM (SELECT doc_id, string_split(text, ' ') AS ws,
                    unnest(generate_series(1, len(string_split(text, ' ')))) AS i
             FROM documents WHERE doc_id < 20)
       ORDER BY doc_id, pos""") { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("token"))
      .orderBy("doc_id", "pos")
  }

  /** explode_outer: docs WITH 'spark' produce one row per occurrence,
    * docs without keep a single null-token row. */
  private val q51 = Q(
    "q51_explode_outer",
    """SELECT d.doc_id, m.tok
       FROM documents d
       LEFT JOIN (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        t -> t = 'spark')) AS tok
                  FROM documents) m
         ON d.doc_id = m.doc_id
       WHERE d.doc_id < 100
       ORDER BY d.doc_id, m.tok""") { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        explode_outer(filter(split(col("text"), " "), t => t === "spark")).as("tok"))
      .orderBy("doc_id", "tok")
  }

  /** Extended date parts on event timestamps; dayofweek aligned to
    * Spark's 1=Sunday convention (DuckDB uses 0=Sunday). */
  private val q49 = Q(
    "q49_date_parts",
    """SELECT event_id,
              hour(ts) AS h, minute(ts) AS mi, second(ts) AS sec,
              quarter(ts) AS qtr, dayofweek(ts) + 1 AS dow,
              dayofyear(ts) AS doy, weekofyear(ts) AS woy,
              last_day(ts) AS month_end
       FROM events WHERE event_id < 300 ORDER BY event_id""") { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 300)
      .select(col("event_id"),
        hour(col("ts")).cast(LongType).as("h"),
        minute(col("ts")).cast(LongType).as("mi"),
        second(col("ts")).cast(LongType).as("sec"),
        quarter(col("ts")).cast(LongType).as("qtr"),
        dayofweek(col("ts")).cast(LongType).as("dow"),
        dayofyear(col("ts")).cast(LongType).as("doy"),
        weekofyear(col("ts")).cast(LongType).as("woy"),
        last_day(col("ts")).as("month_end"))
      .orderBy("event_id")
  }

  /** Typed Dataset joinWith: the tuple-valued join surface, flattened
    * back to columns for the oracle. */
  private val q50 = Q(
    "q50_typed_joinwith",
    """SELECT o_orderkey, c_custkey, c_mktsegment, round(o_totalprice, 2) AS price
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE o_orderkey < 2000
       ORDER BY o_orderkey""") { (s, d) =>
    import s.implicits._
    val orders = Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey").as("okey"), col("o_custkey").as("ocust"),
        col("o_totalprice").as("price")).as[(Long, Long, Double)]
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
    orders.joinWith(cust, orders("ocust") === cust("c_custkey"))
      .select(col("_1.okey").as("o_orderkey"),
        col("_2.c_custkey").as("c_custkey"),
        col("_2.c_mktsegment").as("c_mktsegment"),
        round(col("_1.price"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  /** Bitwise + character scalar family on integer keys. */
  private val q53 = Q(
    "q53_bitwise_chars",
    """SELECT p_partkey,
              CAST(p_partkey & 255 AS BIGINT) AS low_byte,
              CAST(p_partkey | 4096 AS BIGINT) AS with_flag,
              CAST(xor(p_partkey, 170) AS BIGINT) AS xored,
              CAST(p_size << 2 AS BIGINT) AS shifted_l,
              CAST(p_partkey >> 3 AS BIGINT) AS shifted_r,
              CAST(ascii(p_name) AS BIGINT) AS first_char_code,
              chr(65 + CAST(p_partkey % 26 AS INT)) AS letter
       FROM part WHERE p_partkey < 400 ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") < 400)
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(255).as("low_byte"),
        col("p_partkey").bitwiseOR(4096).as("with_flag"),
        col("p_partkey").bitwiseXOR(170).as("xored"),
        shiftleft(col("p_size"), 2).cast(LongType).as("shifted_l"),
        shiftright(col("p_partkey"), 3).as("shifted_r"),
        ascii(col("p_name")).cast(LongType).as("first_char_code"),
        chr(lit(65) + (col("p_partkey") % 26).cast("int")).as("letter"))
      .orderBy("p_partkey")
  }

  val defs: Seq[Q] = Seq(q48, q49, q50, q51, q53)
}

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

  /** Map higher-order functions: transform_keys/values, map_filter,
    * map_zip_with — extracted to scalars for the oracle (map internals
    * differ across engines; values must not). */
  private val q56 = Q(
    "q56_map_hofs",
    """SELECT n_nationkey,
              'NAME' AS upper_key_present,
              n_name || '!' AS bumped_name_val,
              CAST(n_regionkey AS VARCHAR) AS kept_region,
              n_name || '|' || CAST(n_regionkey AS VARCHAR) AS zipped
       FROM nation ORDER BY n_nationkey""") { (s, d) =>
    import org.apache.spark.sql.types.StringType
    val m = map_from_entries(array(
      struct(lit("name").as("k"), col("n_name").as("v")),
      struct(lit("region").as("k"), col("n_regionkey").cast(StringType).as("v"))))
    Tables.nation(s, d)
      .select(col("n_nationkey"), m.as("m"))
      .select(col("n_nationkey"),
        element_at(map_keys(transform_keys(col("m"), (k, _) => upper(k))), 1)
          .as("upper_key_present"),
        element_at(transform_values(col("m"), (_, v) => concat(v, lit("!"))), "name")
          .as("bumped_name_val"),
        element_at(map_filter(col("m"), (k, _) => k === "region"), "region")
          .as("kept_region"),
        element_at(
          map_zip_with(col("m"), col("m"), (k, v1, v2) =>
            when(k === "name", concat(v1, lit("|"))).otherwise(v2)), "name")
          .as("zipped_prefix"))
      .select(col("n_nationkey"), col("upper_key_present"), col("bumped_name_val"),
        col("kept_region"),
        concat(col("zipped_prefix"), col("kept_region")).as("zipped"))
      .orderBy("n_nationkey")
  }

  /** Array set operations: union, intersect, except (sorted-distinct on
    * both sides for a canonical comparison). */
  private val q57 = Q(
    "q57_array_setops",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              array_to_string(list_sort(list_distinct(
                list_concat(string_split(a.text,' '), string_split(b.text,' ')))), ',') AS union_toks,
              array_to_string(list_sort(list_distinct(
                list_intersect(string_split(a.text,' '), string_split(b.text,' ')))), ',') AS common_toks,
              coalesce(array_to_string(list_sort(list_distinct(list_filter(string_split(a.text,' '),
                x -> NOT list_contains(string_split(b.text,' '), x)))), ','), '') AS only_a
       FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
       WHERE a.doc_id < 30
       ORDER BY id_a""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val a = docs.select(col("doc_id").as("id_a"), split(col("text"), " ").as("ta"))
      .filter(col("id_a") < 30)
    val b = docs.select(col("doc_id").as("id_b"), split(col("text"), " ").as("tb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        array_join(array_sort(array_distinct(array_union(col("ta"), col("tb")))), ",")
          .as("union_toks"),
        array_join(array_sort(array_distinct(array_intersect(col("ta"), col("tb")))), ",")
          .as("common_toks"),
        array_join(array_sort(array_distinct(array_except(col("ta"), col("tb")))), ",")
          .as("only_a"))
      .orderBy("id_a")
  }

  /** Error-safe arithmetic: try_divide / try_add / safe casts — NULL on
    * failure instead of an exception. */
  private val q58 = Q(
    "q58_try_functions",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_linenumber - 1 = 0 THEN NULL
                   ELSE round(l_quantity / (l_linenumber - 1), 6) END AS qty_per_prev_line,
              TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
              TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_round_trip
       FROM lineitem WHERE l_orderkey < 300
       ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(try_divide(col("l_quantity"), col("l_linenumber") - 1), 6)
          .as("qty_per_prev_line"),
        col("l_returnflag").try_cast("int").as("flag_as_int"),
        col("l_quantity").cast("string").try_cast("double").as("qty_round_trip"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val defs: Seq[Q] = Seq(q48, q49, q50, q51, q53, q56, q57, q58)
}

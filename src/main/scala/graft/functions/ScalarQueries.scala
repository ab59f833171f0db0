package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 B7: the scalar function library, one query per family,
  * every representative function exercised against the DuckDB oracle.
  * All functions are Spark built-ins (codegen'd, no UDFs) — the inventory
  * deliverable is the verified Spark↔ANSI-SQL mapping.
  */
object ScalarQueries {

  /** Strings: concat, substring, upper/lower, trim, length, split,
    * regexp_extract, regexp_replace, lpad, instr. */
  private val q20 = Q(
    "q20_string_funcs",
    """SELECT p_partkey,
              concat(p_brand, ':', p_type) AS brand_type,
              substring(p_name, 1, 4) AS name4,
              upper(p_name) AS uname, lower(p_brand) AS lbrand,
              trim('  ' || p_name || ' ') AS trimmed,
              length(p_name) AS name_len,
              len(string_split(p_name, ' ')) AS n_words,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
              regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
              instr(p_name, 'e') AS first_e
       FROM part WHERE p_partkey < 500 ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 4).as("name4"),
        upper(col("p_name")).as("uname"), lower(col("p_brand")).as("lbrand"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
        length(col("p_name")).cast(LongType).as("name_len"),
        size(split(col("p_name"), " ")).cast(LongType).as("n_words"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_size").cast(StringType), 4, "0").as("padded_size"),
        instr(col("p_name"), "e").cast(LongType).as("first_e"))
      .orderBy("p_partkey")
  }

  /** Dates/times: year/month/day, date_add, datediff, date_trunc,
    * unix_timestamp, to_date, month arithmetic. Temporal outputs leave as
    * date or formatted string / epoch bigint for oracle parity. */
  private val q21 = Q(
    "q21_date_funcs",
    """SELECT o_orderkey,
              year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dom,
              CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
              date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
              strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
              CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
              CAST(o_orderdate AS DATE) AS odate,
              (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since_95
       FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""") { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
        datediff(col("o_orderdate").cast(DateType), to_date(lit("1995-01-01")))
          .cast(LongType).as("days_since_95"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        col("o_orderdate").cast(DateType).as("odate"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast(LongType).as("months_since_95"))
      .orderBy("o_orderkey")
  }

  /** Math: abs, round, floor/ceil, pow, sqrt, log, exp, pmod, sign.
    * Transcendentals rounded to 6 dp (libm vs StrictMath last-ulp). */
  private val q22 = Q(
    "q22_math_funcs",
    """SELECT l_orderkey, l_linenumber,
              abs(l_extendedprice - 1000) AS dist_1000,
              round(l_extendedprice, 1) AS r1,
              CAST(floor(l_extendedprice) AS BIGINT) AS fl,
              CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
              round(pow(l_quantity, 1.5), 6) AS q_pow,
              round(sqrt(l_extendedprice), 6) AS price_sqrt,
              round(ln(l_extendedprice), 6) AS price_ln,
              round(exp(l_discount), 6) AS disc_exp,
              ((CAST(l_orderkey AS INT) % 7) + 7) % 7 AS key_mod7,
              CAST(sign(l_extendedprice - 1500) AS BIGINT) AS over_1500
       FROM lineitem WHERE l_orderkey < 400 ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 400)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 1000).as("dist_1000"),
        round(col("l_extendedprice"), 1).as("r1"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        round(pow(col("l_quantity"), 1.5), 6).as("q_pow"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(exp(col("l_discount")), 6).as("disc_exp"),
        pmod(col("l_orderkey").cast(IntegerType), lit(7)).as("key_mod7"),
        signum(col("l_extendedprice") - 1500).cast(LongType).as("over_1500"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Arrays + higher-order functions on tokenized document text: size,
    * contains, distinct, slice, sort, transform, filter, aggregate.
    * Array outputs serialized via array_to_string for oracle parity. */
  private val q23 = Q(
    "q23_array_funcs",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              list_contains(string_split(text, ' '), 'spark') AS has_spark,
              len(list_distinct(string_split(text, ' '))) AS n_uniq,
              array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 5)), ',') AS first5_sorted,
              CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars,
              len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long
       FROM documents WHERE doc_id < 100 ORDER BY doc_id""") { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        array_contains(toks, "spark").as("has_spark"),
        size(array_distinct(toks)).cast(LongType).as("n_uniq"),
        array_join(array_sort(slice(toks, 1, 5)), ",").as("first5_sorted"),
        aggregate(transform(toks, x => length(x).cast(LongType)), lit(0L), (a, x) => a + x)
          .as("total_chars"),
        size(filter(toks, x => length(x) > 4)).cast(LongType).as("n_long"))
      .orderBy("doc_id")
  }

  /** Maps: map_from_entries / map_keys / map_values / element_at built on
    * the fly, extracted back to scalars (the oracle computes the scalars
    * directly — DuckDB MAP internals differ, values must not). */
  private val q24 = Q(
    "q24_map_funcs",
    """SELECT n_nationkey,
              2 AS n_keys,
              n_name AS name_val,
              CAST(n_regionkey AS VARCHAR) AS region_val,
              'name,region' AS key_list
       FROM nation ORDER BY n_nationkey""") { (s, d) =>
    val m = map_from_entries(array(
      struct(lit("name").as("k"), col("n_name").as("v")),
      struct(lit("region").as("k"), col("n_regionkey").cast(StringType).as("v"))))
    Tables.nation(s, d)
      .select(col("n_nationkey"), m.as("m"))
      .select(col("n_nationkey"),
        size(map_keys(col("m"))).as("n_keys"),
        element_at(col("m"), "name").as("name_val"),
        element_at(col("m"), "region").as("region_val"),
        array_join(map_keys(col("m")), ",").as("key_list"))
      .orderBy("n_nationkey")
  }

  /** JSON on events.props: get_json_object / from_json / to_json /
    * json_tuple vs DuckDB's JSON extension. */
  private val q25 = Q(
    "q25_json_funcs",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_get,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
              to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INT)))::VARCHAR AS rebuilt,
              json_extract_string(props, '$.k') AS k_tuple,
              CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
       FROM events WHERE event_id < 500 ORDER BY event_id""") { (s, d) =>
    val kSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, d)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_get"),
        from_json(col("props"), kSchema).getField("k").as("k_parsed"),
        to_json(struct(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))).as("rebuilt"),
        json_tuple(col("props"), "k").as("k_tuple"),
        get_json_object(col("props"), "$.missing").as("absent"))
      .orderBy("event_id")
  }

  /** XML scalar family: to_xml / from_xml / xpath extraction (Spark 4
    * built-ins — the per-row siblings of the src12 file source). The
    * oracle is round-trip identity: struct → XML string → parsed struct
    * (+ one XPath pull) must reproduce the original parquet columns, so
    * any escaping/coercion drift in either direction fails the hash.
    * DuckDB has no XML extension here, which is exactly why identity is
    * the right oracle — the reference answer is the input itself.
    *
    * Scale shape: pure map-side column math, one narrow pass. */
  private val q74 = Q(
    "q74_xml_funcs",
    """SELECT n_nationkey, n_name, n_regionkey, n_name AS xpath_name
       FROM nation ORDER BY n_nationkey""") { (s, d) =>
    val sch = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    Tables.nation(s, d)
      .select(to_xml(struct(col("n_nationkey"), col("n_name"), col("n_regionkey"))).as("x"))
      .select(from_xml(col("x"), sch).as("r"),
        // to_xml's default row frame is <ROW>…</ROW>
        xpath_string(col("x"), lit("/ROW/n_name")).as("xpath_name"))
      .select(col("r.n_nationkey").as("n_nationkey"), col("r.n_name").as("n_name"),
        col("r.n_regionkey").as("n_regionkey"), col("xpath_name"))
      .orderBy("n_nationkey")
  }

  /** Conditionals/misc: greatest, least, nullif+coalesce, CASE chains,
    * bool aggregation of conditions. */
  private val q26 = Q(
    "q26_conditional_funcs",
    """SELECT c_custkey,
              greatest(c_acctbal, 1000.0) AS floor_bal,
              least(c_acctbal, 5000.0) AS cap_bal,
              coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
              (c_acctbal IS NOT NULL AND c_acctbal > 0) AS solvent,
              CASE WHEN c_acctbal < 0 THEN 'neg'
                   WHEN c_acctbal < 2500 THEN 'low' ELSE 'high' END AS bal_band
       FROM customer ORDER BY c_custkey""") { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        greatest(col("c_acctbal"), lit(1000.0)).as("floor_bal"),
        least(col("c_acctbal"), lit(5000.0)).as("cap_bal"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
        (col("c_acctbal").isNotNull && col("c_acctbal") > 0).as("solvent"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 2500, "low")
          .otherwise("high").as("bal_band"))
      .orderBy("c_custkey")
  }

  /** B4 misc aggregates: count(distinct), filtered agg (FILTER/when),
    * collect_set sorted to a string, min/max over strings. */
  private val q27 = Q(
    "q27_agg_misc",
    """SELECT l_returnflag,
              count(DISTINCT l_suppkey) AS n_supp,
              count(DISTINCT l_partkey) AS n_part,
              round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS disc_rev,
              count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
              array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
              min(l_shipdate::DATE) AS first_ship, max(l_shipdate::DATE) AS last_ship
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(0)), 2)
          .as("disc_rev"),
        count(when(col("l_quantity") >= 25, lit(1))).as("n_bulk"),
        array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        min(col("l_shipdate").cast(DateType)).as("first_ship"),
        max(col("l_shipdate").cast(DateType)).as("last_ship"))
      .orderBy("l_returnflag")
  }

  /** B4: exact percentiles (oracle-matched); approx_count_distinct and
    * percentile_approx ride along compared only by rows (they are estimates
    * by definition — SURVEY.md §5.2 tolerance note). */
  private val q28 = Q(
    "q28_percentiles",
    """SELECT o_orderpriority,
              round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
              round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
              round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
              round(min(o_totalprice), 2) AS lo,
              round(max(o_totalprice), 2) AS hi
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"),
        round(percentile(col("o_totalprice"), lit(0.99)), 4).as("p99"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("o_orderpriority")
  }

  /** More array HOFs: exists, forall, flatten, sequence, array_repeat,
    * arrays_zip-equivalent pairing. */
  private val q40 = Q(
    "q40_array_hofs",
    """SELECT doc_id,
              len(list_filter(string_split(text, ' '), t -> t = 'spark')) > 0 AS has_spark,
              len(list_filter(string_split(text, ' '), t -> length(t) >= 1))
                = len(string_split(text, ' ')) AS all_nonempty,
              CAST(list_sum(list_transform(generate_series(1, 5), i -> i * i)) AS BIGINT) AS sum_sq_1_5,
              array_to_string(list_transform(generate_series(1, 3),
                i -> string_split(text, ' ')[i] || '#' || i), ',') AS indexed_first3
       FROM documents WHERE doc_id < 60 ORDER BY doc_id""") { (s, d) =>
    val ts = split(col("text"), " ")
    Tables.documents(s, d)
      .filter(col("doc_id") < 60)
      .select(col("doc_id"),
        exists(ts, t => t === "spark").as("has_spark"),
        forall(ts, t => length(t) >= 1).as("all_nonempty"),
        aggregate(transform(sequence(lit(1), lit(5)), i => i * i),
          lit(0L), (a, x) => a + x).as("sum_sq_1_5"),
        array_join(transform(sequence(lit(1), lit(3)),
          i => concat(element_at(ts, i), lit("#"), i.cast(StringType))), ",")
          .as("indexed_first3"))
      .orderBy("doc_id")
  }

  /** B7 string similarity: Levenshtein edit distance between adjacent
    * part names (a narrow self-join — each row only meets its key
    * neighbor, never a cross product). */
  private val q62 = Q(
    "q62_edit_distance",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
              CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
              CAST(abs(length(a.p_name) - length(b.p_name)) AS BIGINT) AS len_diff
       FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
       WHERE a.p_partkey < 200
       ORDER BY id_a""") { (s, d) =>
    val p = Tables.part(s, d).select("p_partkey", "p_name")
    val a = p.as("a"); val b = p.as("b")
    a.join(b, col("b.p_partkey") === col("a.p_partkey") + 1)
      .filter(col("a.p_partkey") < 200)
      .select(
        col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast(LongType).as("edit_dist"),
        abs(length(col("a.p_name")) - length(col("b.p_name"))).cast(LongType).as("len_diff"))
      .orderBy("id_a")
  }

  /** B7 regexp family beyond extract/replace: regexp_count /
    * regexp_substr / regexp_instr / regexp_like. (For a left-anchored
    * scan, the first regex match IS the first literal occurrence of its
    * own text, so `strpos(text, regexp_extract(...))` is an exact
    * regexp_instr oracle for these patterns.) */
  private val q65 = Q(
    "q65_regexp_family",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS BIGINT) AS n_vowel_runs,
              coalesce(nullif(regexp_extract(text, '[a-z]{9,}'), ''), '-') AS first_long_word,
              CAST(CASE WHEN regexp_extract(text, '[aeiou]{2,}') = ''
                        THEN 0
                        ELSE strpos(text, regexp_extract(text, '[aeiou]{2,}')) END AS BIGINT)
                AS first_run_pos,
              regexp_matches(text, '(the|le|der|el) ') AS has_article
       FROM documents ORDER BY doc_id""") { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      expr("regexp_count(text, '[aeiou]{2,}')").cast(LongType).as("n_vowel_runs"),
      // Spark regexp_substr → NULL on no match (DuckDB regexp_extract → '')
      coalesce(expr("regexp_substr(text, '[a-z]{9,}')"), lit("-"))
        .as("first_long_word"),
      expr("regexp_instr(text, '[aeiou]{2,}')").cast(LongType).as("first_run_pos"),
      expr("regexp_like(text, '(the|le|der|el) ')").as("has_article"))
      .orderBy("doc_id")
  }

  /** B4/B7: bitwise and boolean aggregates (bit_and/or/xor over partkeys,
    * bool_and/bool_or over predicates) — partial-aggregable like any
    * algebraic agg, so they scale as ordinary map-side-combine aggs. */
  private val q67 = Q(
    "q67_bit_bool_aggs",
    """SELECT l_returnflag,
              bit_and(l_partkey) AS all_and,
              bit_or(l_partkey) AS all_or,
              bit_xor(l_partkey) AS all_xor,
              bool_and(l_quantity > 0) AS qty_positive,
              bool_or(l_discount > 0.09) AS any_big_discount
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("bit_and(l_partkey)").as("all_and"),
        expr("bit_or(l_partkey)").as("all_or"),
        expr("bit_xor(l_partkey)").as("all_xor"),
        expr("bool_and(l_quantity > 0)").as("qty_positive"),
        expr("bool_or(l_discount > 0.09)").as("any_big_discount"))
      .orderBy("l_returnflag")
  }

  val defs: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q40, q62, q65, q67, q74)
}

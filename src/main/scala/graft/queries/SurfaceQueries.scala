package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.sources.Tables

/** Extended relational surface beyond SURVEY §2's reference rows: the scalar
  * function families (math / regex / string / bitwise / trig), generator
  * (explode/posexplode/sequence) shapes, window frame specs and distribution
  * functions, extended aggregates (listagg / bool / median / filtered),
  * outer and cross joins, SQL-text-authored queries (CTE, EXISTS — exercised
  * through `spark.sql` so the SQL parser path is judged too), INTERSECT
  * ALL / EXCEPT ALL, and deterministic hash-based sampling.
  *
  * Every query is oracle-checked against DuckDB. Float parity contract (see
  * [[graft.Q]]): libm-backed functions (sqrt/exp/ln/sin/…) are rounded to 6dp
  * on both sides; everything else is exact integer/decimal arithmetic or a
  * single IEEE double op with bit-identical operands.
  *
  * Scale notes: all scalar/generator queries are row-local (no shuffle);
  * window queries shuffle once on their partition key; the SQL-authored
  * joins follow the same broadcast-dimension posture as CoreQueries (AQE
  * broadcasts the sub-threshold side).
  */
object SurfaceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Registers the named tables as temp views for SQL-text-authored queries
    * and returns the session (same parquet data the DataFrame path reads). */
  private def views(s: SparkSession, dir: String, names: String*): SparkSession = {
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s
  }

  val all: Seq[Q] = Seq(

    // TPC-H Q1 shape (the canonical pricing-summary report): multi-measure
    // grouped aggregation with exact scaled-long sums — qty/price are 2-dp
    // (cent scale), disc_price = extprice*(1-disc) is 4-dp (scale 1e4); the
    // double products sit within ~1e-9 of the exact 4-dp rationals so
    // round() recovers exact integers on both engines.
    Q("q14_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(round(col("l_quantity") * 100, 0).cast("long")).cast("double") / 100.0).as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100, 0).cast("long")).cast("double") / 100.0).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000, 0).cast("long"))
            .cast("double") / 10000.0).as("sum_disc_price"),
          (sum(round(col("l_quantity") * 100, 0).cast("long")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"),
          (sum(round(col("l_discount") * 100, 0).cast("long")).cast("double") / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS DOUBLE) / CAST(10000 AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Scalar function families ----------------------------------------

    // Math surface: abs/sign/mod exact; sqrt/exp/ln/log10/pow rounded 6dp.
    Q("p15_math_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        abs(col("o_totalprice") - 150000).as("abs_diff"),
        signum(col("o_totalprice") - 150000).cast("int").as("sign_diff"),
        (col("o_orderkey") % 7).as("mod7"),
        round(sqrt(col("o_totalprice")), 6).as("sqrt_p"),
        round(log(col("o_totalprice")), 6).as("ln_p"),
        round(log10(col("o_totalprice")), 6).as("log10_p"),
        round(pow(col("o_totalprice") / 100000, 2), 6).as("pow_p"),
        ceil(col("o_totalprice")).cast("long").as("ceil_p"),
        floor(col("o_totalprice")).cast("long").as("floor_p")),
      Some("""SELECT o_orderkey,
        |  abs(o_totalprice - 150000) AS abs_diff,
        |  CAST(sign(o_totalprice - 150000) AS INT) AS sign_diff,
        |  o_orderkey % 7 AS mod7,
        |  round(sqrt(o_totalprice), 6) AS sqrt_p,
        |  round(ln(o_totalprice), 6) AS ln_p,
        |  round(log10(o_totalprice), 6) AS log10_p,
        |  round(pow(o_totalprice / 100000, 2), 6) AS pow_p,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floor_p
        |FROM orders""".stripMargin)),

    // Regex surface: replace-all, group extract, match count, split size.
    Q("p16_regexp_funcs",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_count(col("p_name"), lit("[a-z]+")).as("n_words"),
        size(split(col("p_type"), " ")).as("n_type_words")),
      Some("""SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
        |  len(str_split(p_type, ' ')) AS n_type_words
        |FROM part""".stripMargin)),

    // String surface beyond p11: translate/repeat/reverse/ascii/strpos/pads.
    Q("p17_string_funcs2",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        translate(col("p_brand"), "Brand#", "brnd-0").as("translated"),
        reverse(col("p_name")).as("reversed"),
        ascii(col("p_name")).as("first_byte"),
        instr(col("p_name"), "a").as("first_a"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        repeat(col("p_brand"), 2).as("doubled")),
      Some("""SELECT p_partkey,
        |  translate(p_brand, 'Brand#', 'brnd-0') AS translated,
        |  reverse(p_name) AS reversed,
        |  ascii(p_name) AS first_byte,
        |  strpos(p_name, 'a') AS first_a,
        |  lpad(p_brand, 12, '*') AS padded,
        |  repeat(p_brand, 2) AS doubled
        |FROM part""".stripMargin)),

    // Bitwise surface: and/or/xor/shifts/popcount on integer keys.
    Q("p18_bitwise",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(255)).as("and255"),
        (col("o_orderkey").bitwiseOR(4096)).as("or4096"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("xor_cust"),
        shiftleft(col("o_orderkey"), 2).as("shl2"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).as("popcount")),
      Some("""SELECT o_orderkey,
        |  o_orderkey & 255 AS and255,
        |  o_orderkey | 4096 AS or4096,
        |  xor(o_orderkey, o_custkey) AS xor_cust,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 2 AS shr2,
        |  bit_count(o_orderkey) AS popcount
        |FROM orders""".stripMargin)),

    // Trig/transcendental surface, rounded 6dp (libm parity contract).
    Q("p20_trig_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        round(sin(col("c_acctbal") / 1000), 6).as("sin_b"),
        round(cos(col("c_acctbal") / 1000), 6).as("cos_b"),
        round(atan2(col("c_acctbal"), lit(5000.0)), 6).as("atan2_b"),
        round(degrees(col("c_acctbal") / 10000), 6).as("deg_b"),
        round(radians(col("c_custkey").cast("double")), 6).as("rad_k")),
      Some("""SELECT c_custkey,
        |  round(sin(c_acctbal / 1000), 6) AS sin_b,
        |  round(cos(c_acctbal / 1000), 6) AS cos_b,
        |  round(atan2(c_acctbal, 5000.0), 6) AS atan2_b,
        |  round(degrees(c_acctbal / 10000), 6) AS deg_b,
        |  round(radians(CAST(c_custkey AS DOUBLE)), 6) AS rad_k
        |FROM customer""".stripMargin)),

    // ---- Generators ------------------------------------------------------

    // sequence + explode: row-local fan-out, no shuffle.
    Q("g1_explode_sequence",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          explode(sequence(lit(1L), col("o_orderkey") % 3 + 1)).as("step")),
      Some("""SELECT o_orderkey, unnest(generate_series(1, o_orderkey % 3 + 1)) AS step
        |FROM orders""".stripMargin)),

    // posexplode (ordinal-aware fan-out) over tokenized documents.
    Q("g2_posexplode",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("tok")),
      // DuckDB lacks WITH ORDINALITY; two unnests of equal length zip.
      Some("""WITH p AS (SELECT doc_id, str_split(text, ' ') AS parts FROM documents)
        |SELECT doc_id,
        |  unnest(generate_series(1, len(parts))) - 1 AS pos,
        |  parts[unnest(generate_series(1, len(parts)))] AS tok
        |FROM p""".stripMargin)),

    // ---- Window frames & distribution functions --------------------------

    // RANGE frame over event-time: per-customer 30-day trailing revenue.
    // Exact decimal sums; the frame is keyed on epoch seconds on both sides.
    Q("w6_range_frame",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(unix_timestamp(col("o_orderdate")))
          .rangeBetween(-30L * 86400, 0)
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast("decimal(20,4)")).over(w)
            .cast("double").as("trailing_30d"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM orders""".stripMargin)),

    // percent_rank / cume_dist / nth_value with total ordering.
    Q("w7_dist_funcs",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          nth_value(col("c_custkey"), 2).over(wf).as("second_key"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  nth_value(c_custkey, 2) OVER (
        |    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin)),

    // ---- Extended aggregates ---------------------------------------------

    // listagg / string_agg with deterministic (sorted, distinct) contents.
    Q("a15_listagg",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses")),
      Some("""SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // bool_and / bool_or.
    Q("a16_bool_agg",
      (s, d) => t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(
          bool_and(col("c_acctbal") > 0).as("all_positive"),
          bool_or(col("c_acctbal") > 9000).as("any_rich")),
      Some("""SELECT c_mktsegment,
        |  bool_and(c_acctbal > 0) AS all_positive,
        |  bool_or(c_acctbal > 9000) AS any_rich
        |FROM customer GROUP BY c_mktsegment""".stripMargin)),

    // median (exact, interpolating): both engines average the two middles.
    // VERIFICATION-SCALE CONSTRUCT (buffers each group's values — see a10's
    // guard comment; the 100 TB path is a19's approx_percentile sketch).
    Q("a17_median",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(median(col("o_totalprice")).as("median_price")),
      Some("""SELECT o_orderstatus, median(CAST(o_totalprice AS DOUBLE)) AS median_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Filtered aggregates: count_if / FILTER clause.
    Q("a18_filtered_agg",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 150000).as("n_large"),
          sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(lit(0)).cast("decimal(20,4)")).cast("double").as("f_revenue")),
      Some("""SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_large,
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END
        |    AS DECIMAL(20,4))) AS DOUBLE) AS f_revenue
        |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- Joins -----------------------------------------------------------

    // Full outer join: customer spine vs per-customer order aggregate.
    Q("j3_full_outer",
      (s, d) => {
        val agg = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
          .join(agg, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  COALESCE(c_mktsegment, 'NO_CUSTOMER') AS segment,
        |  COALESCE(n_orders, 0) AS n_orders
        |FROM customer
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey""".stripMargin)),

    // Cross join (small × small only — dimension tables).
    Q("j4_cross_join",
      (s, d) => t(s, d, "nation").select("n_name", "n_regionkey")
        .crossJoin(t(s, d, "region").select("r_regionkey", "r_name"))
        .select("n_name", "r_name", "n_regionkey", "r_regionkey"),
      Some("""SELECT n_name, r_name, n_regionkey, r_regionkey
        |FROM nation CROSS JOIN region""".stripMargin)),

    // ---- SQL-text-authored queries (parser path) -------------------------

    // Correlated EXISTS via spark.sql — same text shape DuckDB runs.
    Q("j5_exists_sql",
      (s, d) => views(s, d, "customer", "orders").sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin),
      Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin)),

    // NOT EXISTS (anti shape through the parser).
    Q("j6_not_exists_sql",
      (s, d) => views(s, d, "customer", "orders").sql(
        """SELECT c_custkey FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin),
      Some("""SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),

    // IN-subquery (rewrites to a semi join; the DataFrame twin is
    // j_semi_join).
    Q("q16_in_subquery",
      (s, d) => views(s, d, "customer", "orders").sql(
        """SELECT c_custkey, c_mktsegment FROM customer
          |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin)),

    // Hive-style LATERAL VIEW generator syntax through the parser (the
    // DataFrame twin is g2_posexplode).
    Q("q17_lateral_view",
      (s, d) => views(s, d, "documents").sql(
        """SELECT doc_id, tok FROM documents
          |LATERAL VIEW explode(split(text, ' ')) t AS tok
          |WHERE doc_id < 100""".stripMargin),
      Some("""SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 100""".stripMargin)),

    // Correlated scalar-aggregate subqueries through the parser (the
    // TPC-H Q17 "small-quantity orders" shape) — exercises Catalyst's
    // subquery decorrelation: both per-part scalar subqueries rewrite to
    // ONE partkey-keyed aggregate joined back (never a per-row probe).
    // The published predicate l_quantity < 0.2·avg(l_quantity) is kept
    // EXACT by cross-multiplication — q·5·cnt < sum on integral
    // quantities — so no float average ever enters a comparison (the
    // dq_t_closeness discipline applied to the SQL surface); revenue
    // accumulates as decimal(20,4), cast to double once at the end (the
    // q11 convention).
    Q("q18_correlated_avg",
      (s, d) => views(s, d, "lineitem").sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
          |    AS revenue
          |FROM lineitem l
          |WHERE CAST(l_quantity AS BIGINT) * 5 *
          |    (SELECT COUNT(*) FROM lineitem l2
          |     WHERE l2.l_partkey = l.l_partkey)
          |  < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
          |     FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |WHERE CAST(l_quantity AS BIGINT) * 5 *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |     FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // CTE + multi-join + exact-decimal revenue rollup (TPC-H Q5 shape).
    Q("q11_cte_revenue",
      (s, d) => views(s, d, "customer", "orders", "lineitem", "nation").sql(
        """WITH rev AS (
          |  SELECT o_custkey,
          |    SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
          |        CAST(1 - l_discount AS DECIMAL(20,4))) AS revenue
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  GROUP BY o_custkey)
          |SELECT n_name, CAST(SUM(revenue) AS DOUBLE) AS nation_revenue
          |FROM rev
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin),
      Some("""WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
        |        CAST(1 - l_discount AS DECIMAL(20,4))) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey)
        |SELECT n_name, CAST(SUM(revenue) AS DOUBLE) AS nation_revenue
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)),

    // Engine-registered SQL function through the parser path: the custom
    // Catalyst expression surface (plans.GraftExtensions) consumed exactly
    // as a user would — `SELECT graft_parse_duration(...)` in SQL text.
    Q("q12_sql_udf_duration",
      (s, d) => {
        graft.plans.GraftExtensions.install(s)
        views(s, d, "orders").sql(
          """SELECT o_orderkey,
            |  graft_parse_duration(concat(
            |    'PT', CAST(o_orderkey % 12 AS STRING), 'H',
            |    CAST(o_custkey % 60 AS STRING), 'M',
            |    CAST(o_orderkey % 60 AS STRING), 'S')) AS dur_sec
            |FROM orders""".stripMargin)
      },
      Some("""SELECT o_orderkey,
        |  (o_orderkey % 12) * 3600 + (o_custkey % 60) * 60 + (o_orderkey % 60) AS dur_sec
        |FROM orders""".stripMargin)),

    // The codegen'd native cosine through the same SQL path (bounded
    // pairwise — the ANN operators are the scale path).
    Q("q13_sql_udf_cosine",
      (s, d) => {
        graft.plans.GraftExtensions.install(s)
        views(s, d, "embeddings").sql(
          """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            |  round(graft_cosine(a.embedding, b.embedding), 4) AS sim
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE a.vec_id < 64 AND b.vec_id < 64
            |  AND round(graft_cosine(a.embedding, b.embedding), 4) >= 0.3""".stripMargin)
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 64 AND b.vec_id < 64
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.3""".stripMargin)),

    // ---- Set operations (ALL variants) -----------------------------------

    Q("set_intersect_all",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey FROM supplier""".stripMargin)),

    Q("set_except_all",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL SELECT s_nationkey FROM supplier""".stripMargin)),

    // MERGE/upsert (warehouse maintenance): updated rows replace their
    // target rows by key, new rows insert. Update values use exact double
    // addition (no rounding path) so both engines are bit-identical.
    Q("k4_merge_upsert",
      (s, d) => {
        val orders = t(s, d, "orders")
        val updates = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("o_orderstatus", lit("U"))
        graft.warehouse.Merge.upsert(orders, updates, Seq("o_orderkey"))
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey % 10 != 0
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin)),

    // Type-2 SCD merge (warehouse/Scd2) judged end-to-end: every customer
    // starts as one open version (mktsegment, from 1995-01-01) and the
    // whole orders table replays as timestamped segment updates — so the
    // oracle re-derives chaining (multiple same-key changes materialize
    // intermediate versions), run-collapse (equal-to-previous updates
    // drop), the stale rule (pre-1995 orders drop: ts must exceed the open
    // valid_from), and the equal-timestamp collapse (same-day conflicting
    // orders keep the greatest attr — 21 real ties at sf0.01). The DuckDB
    // side is the same window pipeline as the engine: tie-collapse by
    // max(seg), lag-vs-baseline keep filter, lead() interval chaining,
    // min-change close of the open version.
    Q("k5_scd2_merge",
      (s, d) => {
        val cur = t(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          to_timestamp(lit("1995-01-01")).as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val upd = t(s, d, "orders").select(
          col("o_custkey").as("k"), col("o_orderpriority").as("seg"),
          col("o_orderdate").as("ts"))
        graft.warehouse.Scd2.merge(cur, upd, Seq("k"), Seq("seg"), "ts")
          .select("k", "seg", "valid_from", "valid_to")
      },
      Some("""WITH cur AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    TIMESTAMP '1995-01-01' AS vf FROM customer),
        |upd1 AS (
        |  SELECT o_custkey AS k, o_orderdate AS ts,
        |    MAX(o_orderpriority) AS seg
        |  FROM orders GROUP BY 1, 2),
        |j AS (
        |  SELECT u.k, u.ts, u.seg, c.seg AS cur_seg
        |  FROM upd1 u LEFT JOIN cur c ON u.k = c.k
        |  WHERE c.vf IS NULL OR u.ts > c.vf),
        |kept AS (
        |  SELECT k, ts, seg FROM (
        |    SELECT k, ts, seg,
        |      COALESCE(LAG(seg) OVER (PARTITION BY k ORDER BY ts),
        |        cur_seg) AS base
        |    FROM j)
        |  WHERE seg IS DISTINCT FROM base),
        |newv AS (
        |  SELECT k, seg, ts AS valid_from,
        |    LEAD(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
        |  FROM kept),
        |firstchg AS (SELECT k, MIN(ts) AS chg FROM kept GROUP BY 1),
        |openout AS (
        |  SELECT c.k, c.seg, c.vf AS valid_from, f.chg AS valid_to
        |  FROM cur c LEFT JOIN firstchg f ON c.k = f.k)
        |SELECT k, seg, valid_from, valid_to FROM openout
        |UNION ALL
        |SELECT k, seg, valid_from, valid_to FROM newv""".stripMargin)),

    // Point-in-time feature lookup against the k5 versioned dimension —
    // the read side SCD2 exists for: every order retrieves the customer's
    // segment AS OF its order date (greatest valid_from <= ts; the
    // version opening exactly at ts applies; orders before the key's
    // first version report NULL). The engine side is ONE user-keyed
    // union-window pass (no inequality join — the aj_asof_join shape);
    // the oracle replays the k5 merge then DuckDB's native ASOF LEFT
    // JOIN — two entirely different evaluation strategies must agree row
    // for row.
    Q("k6_pit_lookup",
      (s, d) => {
        val cur = t(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          to_timestamp(lit("1995-01-01")).as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        val upd = t(s, d, "orders").select(
          col("o_custkey").as("k"), col("o_orderpriority").as("seg"),
          col("o_orderdate").as("ts"))
        val dim = graft.warehouse.Scd2.merge(cur, upd, Seq("k"), Seq("seg"), "ts")
        val probes = t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey").as("k"),
          col("o_orderdate").as("ts"))
        graft.warehouse.PointInTime.lookup(dim, probes, Seq("k"), "ts",
          Seq("seg"))
          .select(col("o_orderkey"), col("k"), col("ts"),
            col("seg").as("seg_asof"))
      },
      Some("""WITH cur AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    TIMESTAMP '1995-01-01' AS vf FROM customer),
        |upd1 AS (
        |  SELECT o_custkey AS k, o_orderdate AS ts,
        |    MAX(o_orderpriority) AS seg
        |  FROM orders GROUP BY 1, 2),
        |j AS (
        |  SELECT u.k, u.ts, u.seg, c.seg AS cur_seg
        |  FROM upd1 u LEFT JOIN cur c ON u.k = c.k
        |  WHERE c.vf IS NULL OR u.ts > c.vf),
        |kept AS (
        |  SELECT k, ts, seg FROM (
        |    SELECT k, ts, seg,
        |      COALESCE(LAG(seg) OVER (PARTITION BY k ORDER BY ts),
        |        cur_seg) AS base
        |    FROM j)
        |  WHERE seg IS DISTINCT FROM base),
        |newv AS (SELECT k, seg, ts AS valid_from FROM kept),
        |dim AS (
        |  SELECT k, seg, vf AS valid_from FROM cur
        |  UNION ALL SELECT k, seg, valid_from FROM newv),
        |probes AS (
        |  SELECT o_orderkey, o_custkey AS k, o_orderdate AS ts FROM orders)
        |SELECT p.o_orderkey, p.k, p.ts, dim.seg AS seg_asof
        |FROM probes p ASOF LEFT JOIN dim
        |  ON p.k = dim.k AND p.ts >= dim.valid_from""".stripMargin)),

    // Incremental materialized-aggregate maintenance: a per-type
    // (count, sum) state built from a BASE window, then advanced by
    // merging the DELTA's partial aggregate — never rescanning base. The
    // 100 TB point: a daily refresh touches one day of events, and the
    // merge is the same associative partial-state combine Spark's own
    // map-side aggregation uses (counts add; sums add as exact decimals,
    // so merge order can't move the result). The oracle computes the
    // aggregate over ALL events in one pass — merged-incremental must
    // equal recomputed-from-scratch exactly, which is the whole
    // correctness contract of incremental view maintenance. avg is
    // DERIVED from merged state (never maintained directly — means don't
    // merge), one rounded IEEE division.
    Q("k7_incremental_agg",
      (s, d) => {
        val split = lit("2024-01-20 00:00:00").cast("timestamp")
        def partial(df: org.apache.spark.sql.DataFrame) = df
          .select(col("event_type"),
            col("value").cast("decimal(20,4)").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(col("y")).cast("decimal(38,4)").as("sv"))
        val ev = t(s, d, "events")
        val base = partial(ev.filter(col("ts") < split))
        val delta = partial(ev.filter(col("ts") >= split))
        base.unionByName(delta)
          .groupBy("event_type")
          .agg(sum(col("n_events")).as("n_events"),
            sum(col("sv")).cast("decimal(38,4)").as("sv"))
          .select(col("event_type"), col("n_events"),
            col("sv").cast("double").as("total_value"),
            round(col("sv").cast("double") / col("n_events").cast("double"), 6)
              .as("mean_value"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS total_value,
        |  round(CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(38,4))
        |      AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
        |FROM events GROUP BY 1""".stripMargin)),

    // JSON path extraction without a declared schema (get_json_object — the
    // schema-on-read probe; js_json_extract/js_map_funcs carry the typed
    // from_json path).
    Q("js_get_json_object",
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path")),
      Some("""SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path
        |FROM events""".stripMargin)),

    // IGNORE NULLS window fill: last non-error value per user over event
    // time — the gap-fill shape of sensor/telemetry pipelines.
    Q("w8_ignore_nulls_fill",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          last(when(col("event_type") =!= "error", col("value")), ignoreNulls = true)
            .over(w).as("last_good_value"))
      },
      Some("""SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type != 'error' THEN value END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_good_value
        |FROM events""".stripMargin)),

    // ---- Reshaping -------------------------------------------------------

    // unpivot/melt: wide → long. DuckDB mirror is the UNION ALL expansion
    // (version-safe vs its UNPIVOT syntax).
    Q("pv_unpivot",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
          "metric", "value"),
      Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin)),

    // ---- Sketch aggregates -----------------------------------------------

    // approx_percentile (quantile sketch): mergeable partial sketches — the
    // distributed shape exact percentiles can't have at 100 TB. DuckDB's
    // approx_quantile is a different sketch (t-digest), so the sketch value
    // itself has no oracle; the judged output is the error-bound verdict:
    // exact percentiles (a10's proven contract) plus booleans asserting the
    // sketch landed within 5% relative error of exact. Sketch drift past
    // the bound hash-mismatches against the oracle's literal TRUEs.
    // The p50/p95_exact columns are VERIFICATION-SCALE ONLY (exact
    // percentile buffers every group value) — they exist to bound-check the
    // sketch, never to ship; the production aggregate IS the sketch.
    Q("a19_approx_percentile",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50_exact"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95_exact"),
          approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("__a50"),
          approx_percentile(col("o_totalprice"), lit(0.95), lit(10000)).as("__a95"))
        .select(col("o_orderstatus"), col("p50_exact"), col("p95_exact"),
          (abs(col("__a50") - col("p50_exact")) / col("p50_exact") < 0.05).as("p50_within"),
          (abs(col("__a95") - col("p95_exact")) / col("p95_exact") < 0.05).as("p95_within")),
      Some("""SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(o_totalprice, 0.95), 6) AS p95_exact,
        |  TRUE AS p50_within, TRUE AS p95_within
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- ANSI-safe try_* surface -----------------------------------------

    // ANSI mode is ON engine-wide; try_divide / try_cast give the
    // null-on-error contract a data pipeline wants for dirty data.
    Q("p22_try_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        try_divide(col("o_totalprice"), (col("o_orderkey") % 3).cast("double")).as("safe_div"),
        substring(col("o_orderpriority"), 1, 1).try_cast("int").as("prio_num"),
        col("o_orderstatus").try_cast("int").as("status_num")),
      Some("""SELECT o_orderkey,
        |  o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
        |  TRY_CAST(o_orderstatus AS INT) AS status_num
        |FROM orders""".stripMargin)),

    // ---- Deterministic sampling ------------------------------------------

    // Hash-based Bernoulli-style sample (~1/16): pure function of the key,
    // identical across engines, partitionings, and cluster sizes.
    Q("sm_hash_sample",
      (s, d) => t(s, d, "lineitem")
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey"), col("l_linenumber"))), 1, 1) === "0")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE substring(md5(l_orderkey || '-' || l_linenumber), 1, 1) = '0'""".stripMargin)),

    // Weighted (importance) sampling, fully deterministic: a Knuth
    // multiplicative hash of the key gives an exact-integer uniform in
    // [0,1); a row survives when uniform < weight (here: length-biased
    // quality weight). Pure per-row arithmetic — identical on any engine,
    // partitioning, or cluster size; the probabilistic-sampling shape
    // without the nondeterminism of rand().
    Q("sm_weighted_sample",
      (s, d) => {
        // the key is reduced into 31-bit space BEFORE the Knuth multiply:
        // (doc_id % 2^31) * 2654435761 < 2^31 * 2^32 / 1.6 ≈ 5.7e18 < 2^63,
        // so the product never overflows signed 64-bit under ANSI mode for
        // ANY doc_id — DuckDB would silently widen to HUGEINT where ANSI
        // Spark throws, and the engines must stay bit-identical at any scale
        val uniform = (pmod(col("doc_id"), lit(2147483648L)) * 2654435761L % 4294967296L)
          .cast("double") / 4294967296.0
        val weight = least(col("n_chars").cast("double") / 1000.0, lit(1.0))
        t(s, d, "documents")
          .filter(uniform < weight)
          .select("doc_id", "n_chars")
      },
      Some("""SELECT doc_id, n_chars FROM documents
        |WHERE CAST(doc_id % 2147483648 * 2654435761 % 4294967296 AS DOUBLE) / 4294967296.0
        |      < least(CAST(n_chars AS DOUBLE) / 1000.0, 1.0)""".stripMargin)),

    // Weighted sampling WITHOUT replacement (Efraimidis & Spirakis, IPL
    // 2006 A-Res): the top-k docs by u^(1/w) — equivalently the k
    // SMALLEST (−ln u)/w — where u is the deterministic 6-hex-digit md5
    // draw in (0, 1] (the dq_bootstrap idiom) and w = n_chars, so longer
    // docs are proportionally likelier but each doc lands at most once
    // (sm_weighted_sample is the Bernoulli/with-replacement counterpart).
    // Exactness: ln u is 6dp-pre-rounded to a scaled long ONCE (the
    // corpus-wide ln discipline — the sample is then a deterministic
    // function of ids and weights on any engine); the sort key is one
    // IEEE division of exact longs, ties broken by doc_id. Scale shape:
    // row-local keying + TakeOrderedAndProject — k-bounded, no shuffle
    // beyond the top-k reduction, the q03 top-k contract.
    Q("sm_weighted_wor",
      (s, d) => {
        val u = conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":wor"))), 1, 6), 16, 10).cast("long")
        val lnu6 = round(log((u + 1).cast("double") / lit(16777216.0))
          * 1000000, 0).cast("long")
        val keyRaw = (-col("lnu6")).cast("double") / col("n_chars").cast("double")
        t(s, d, "documents").filter(col("n_chars").isNotNull)
          .select(col("doc_id"), col("n_chars"), lnu6.as("lnu6"))
          .orderBy(keyRaw, col("doc_id"))
          .limit(50)
          .select(col("doc_id"), col("n_chars"), col("lnu6"),
            round(keyRaw, 6).as("key6"))
      },
      Some("""WITH h AS (
        |  SELECT doc_id, n_chars,
        |  ( (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 1, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 2, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 3, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 4, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 5, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':wor'), 6, 1)) - 1) ) AS f
        |  FROM documents WHERE n_chars IS NOT NULL),
        |k AS (SELECT doc_id, n_chars,
        |    CAST(round(ln(CAST(f + 1 AS DOUBLE) / 16777216.0) * 1000000, 0)
        |      AS BIGINT) AS lnu6
        |  FROM h)
        |SELECT doc_id, n_chars, lnu6,
        |  round(CAST(-lnu6 AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS key6
        |FROM k
        |ORDER BY CAST(-lnu6 AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id
        |LIMIT 50""".stripMargin)),

    // Per-stratum weighted sampling without replacement: A-Res (the
    // sm_weighted_wor key, fresh ':gwor' salt) applied INDEPENDENTLY per
    // source — the top-10 docs per source by (−lnu6)/n_chars — the shape a
    // per-domain curation quota actually needs (a corpus-global WOR pass
    // lets one heavy domain crowd out the rest). Same determinism contract:
    // the ln draw is 6dp-pre-rounded to a scaled long once, the key is one
    // IEEE division of exact longs, doc_id breaks ties. Scale shape: ONE
    // shuffle on the stratum key and a rank filter the optimizer lowers to
    // WindowGroupLimit — per-partition top-k heaps before the exchange, so
    // the full corpus never sorts (the w1/w4 window contract).
    Q("sm_group_wor",
      (s, d) => {
        val u = conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":gwor"))), 1, 6), 16, 10).cast("long")
        val lnu6 = round(log((u + 1).cast("double") / lit(16777216.0))
          * 1000000, 0).cast("long")
        val keyRaw = (-col("lnu6")).cast("double") / col("n_chars").cast("double")
        val w = Window.partitionBy("source")
          .orderBy(keyRaw.asc, col("doc_id").asc)
        t(s, d, "documents").filter(col("n_chars").isNotNull)
          .select(col("source"), col("doc_id"), col("n_chars"),
            lnu6.as("lnu6"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("source"), col("doc_id"), col("n_chars"), col("lnu6"),
            col("rn"), round(keyRaw, 6).as("key6"))
      },
      Some("""WITH h AS (
        |  SELECT source, doc_id, n_chars,
        |  ( (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 1, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 2, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 3, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 4, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 5, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR || ':gwor'), 6, 1)) - 1) ) AS f
        |  FROM documents WHERE n_chars IS NOT NULL),
        |k AS (SELECT source, doc_id, n_chars,
        |    CAST(round(ln(CAST(f + 1 AS DOUBLE) / 16777216.0) * 1000000, 0)
        |      AS BIGINT) AS lnu6
        |  FROM h),
        |r AS (SELECT source, doc_id, n_chars, lnu6,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY CAST(-lnu6 AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id)
        |      AS INT) AS rn,
        |    round(CAST(-lnu6 AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS key6
        |  FROM k)
        |SELECT source, doc_id, n_chars, lnu6, rn, key6
        |FROM r WHERE rn <= 10
        |ORDER BY source, rn""".stripMargin)),

    // Stratified deterministic sample: first 100 of each stratum in
    // hash-of-key order (reproducible train-data subsampling per class).
    Q("sm_stratified",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), row_number().over(w).as("rn"))
          .filter(col("rn") <= 100)
          .drop("rn")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 100""".stripMargin)),

    // Class-balanced downsampling (the classifier-training staple
    // sm_stratified's FIXED quota cannot express): every label keeps
    // exactly min-class-size rows, chosen by the deterministic hash order
    // — so the output is balanced whatever the input skew, and identical
    // on any engine or partitioning. The min class size is a two-level
    // aggregate broadcast back as ONE row; ranking is a label-KEYED
    // window; nothing data-sized crosses the wire twice.
    Q("sm_balanced_downsample",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
        val minN = e.groupBy("label").agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("min_n"))
        val w = Window.partitionBy("label")
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        e.select(col("vec_id"), col("label"),
            row_number().over(w).as("rn"))
          .crossJoin(broadcast(minN))
          .filter(col("rn") <= col("min_n"))
          .select("vec_id", "label")
      },
      Some("""WITH mn AS (
        |  SELECT MIN(n) AS min_n FROM (
        |    SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1)),
        |ranked AS (
        |  SELECT vec_id, label,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM embeddings)
        |SELECT vec_id, label FROM ranked CROSS JOIN mn
        |WHERE rn <= min_n""".stripMargin))
  )
}

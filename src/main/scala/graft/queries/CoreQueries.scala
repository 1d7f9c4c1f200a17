package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.functions.Durations
import graft.operators.GreatestPerGroup
import graft.sources.Tables

/** Reference-parity query surface: the 10 analytics queries plus every other
  * SURVEY §2 operator shape, re-expressed on the synthetic star schema per
  * FIXTURES.md §2.1 so Spark and DuckDB execute comparable programs over
  * identical parquet.
  *
  * Reference query shapes: /root/reference/app.py:441–596 (Q1–Q10), with
  * operator rows S7/P2/P3/P5/P6/P8/P9/J1/J2/A1–A3/O1/O2/U1/K3 per SURVEY §2.
  *
  * Plan quality notes (verified with `.explain("formatted")` in the spec):
  * filters and projections below reach the parquet scan (PushedFilters /
  * ReadSchema); top-k compiles to TakeOrderedAndProject, not a full sort;
  * Q5's agg side and all dimension tables are broadcast.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Exact order-independent sums/averages surfaced as double.
    *
    * Fast path: the monetary/quantity fixtures are 2-dp values, so x*100 sits
    * within ~1e-9 of an integer — `round(x*100)` recovers the exact cent
    * count as a LONG, whose sum is order-independent and long-backed (Spark
    * decimal sums with buffer precision > 18 fall back to BigDecimal and run
    * ~2× slower; see Scratch measurements). Overflow bound: |x| < 5e5 ⇒
    * |scaled| < 5e7 ⇒ safe to ~1.8e11 rows PER GROUP. Beyond that (or for
    * >2-dp data), use the decimal forms below — same determinism, wider
    * range. The final double ops are identical on both engines. */
  private def exactAvg(c: org.apache.spark.sql.Column) =
    sum(round(c * 100, 0).cast("long")).cast("double") / 100.0 / count(lit(1))
  private def exactAvgSql(c: String) =
    s"CAST(SUM(CAST(round($c * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) / COUNT(*)"
  private def exactSum(c: org.apache.spark.sql.Column) =
    sum(round(c * 100, 0).cast("long")).cast("double") / 100.0
  private def exactSumSql(c: String) =
    s"CAST(SUM(CAST(round($c * 100, 0) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE)"

  // The decimal-backed exact-sum configuration (unbounded range, any input
  // scale ≤ 4dp, ~2× the aggregation cost) is used inline where its range
  // is needed: w6_range_frame, a18_filtered_agg, q11_cte_revenue.

  val all: Seq[Q] = Seq(

    // Q1 — projection + null filter (P8): app.py:441–454
    Q("q01_null_filter",
      (s, d) => t(s, d, "customer")
        .filter(col("c_name").isNotNull)
        .select("c_name"),
      Some("SELECT c_name FROM customer WHERE c_name IS NOT NULL"),
      headline = true),

    // Q2 — projection + full sort desc (O1), deterministic tiebreaker: app.py:459–474
    Q("q02_sort_desc",
      (s, d) => t(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey")),
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey")),

    // Q3 — top-k (O2 → TakeOrderedAndProject): app.py:479–499
    Q("q03_topk",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      headline = true),

    // Q4 — projection + full sort (A4 counter passthrough): app.py:504–511
    Q("q04_proj_sort",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")),
      Some("SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey")),

    // Q5 — greatest-per-group, ALL TIES SURVIVE (J1+A1): app.py:516–530
    Q("q05_greatest_per_group",
      (s, d) => GreatestPerGroup
        .viaJoin(t(s, d, "orders"), "o_custkey", "o_totalprice")
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Some("""SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
              FROM orders o
              JOIN (SELECT o_custkey, MAX(o_totalprice) AS mx FROM orders GROUP BY o_custkey) m
                ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.mx""".stripMargin),
      headline = true),

    // Q6 — top-k on the fact table (O2): app.py:535–543
    Q("q06_topk_lineitem",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10")),

    // Q7 — projection + sort (O1): app.py:548–556
    Q("q07_sort_supplier",
      (s, d) => t(s, d, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(col("s_acctbal").desc, col("s_suppkey")),
      Some("SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_acctbal DESC, s_suppkey")),

    // Q8 — filter on date function + DISTINCT (P9+A3): app.py:561–568
    Q("q08_distinct_year",
      (s, d) => t(s, d, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select("o_orderstatus")
        .distinct(),
      Some("SELECT DISTINCT o_orderstatus FROM orders WHERE year(o_orderdate) = 1997")),

    // Q9 — group-by AVG + sort (A2), exact-decimal avg contract (SURVEY §7.4): app.py:574–583
    Q("q09_group_avg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(exactAvg(col("l_quantity")).as("avg_qty"), count(lit(1)).as("n_rows"))
        .orderBy(col("avg_qty").desc, col("l_returnflag")),
      Some(s"""SELECT l_returnflag, ${exactAvgSql("l_quantity")} AS avg_qty, COUNT(*) AS n_rows
               FROM lineitem GROUP BY l_returnflag ORDER BY avg_qty DESC, l_returnflag""".stripMargin),
      headline = true),

    // Q10 — filter + top-k (O2): app.py:587–596
    Q("q10_filter_topk",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    // U1 — union by column alignment, missing columns → null: app.py:217
    Q("u1_union_by_name",
      (s, d) => {
        val c = t(s, d, "customer").select(
          col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment"), lit("customer").as("src"))
        val sup = t(s, d, "supplier").select(
          col("s_name").as("name"), col("s_acctbal").as("acctbal"),
          lit("supplier").as("src"))
        c.unionByName(sup, allowMissingColumns = true)
      },
      Some("""SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment, 'customer' AS src FROM customer
              UNION ALL
              SELECT s_name, s_acctbal, NULL, 'supplier' FROM supplier""".stripMargin)),

    // J2 — FK star joins with broadcast dimensions (SURVEY §2.3): schema-level
    // joins. BOTH dims are pinned broadcast: customer is 1.5% of orders at
    // every SF, and leaving it to AQE risks a sort-merge of the fact side
    // whenever the size estimate lands above the auto-broadcast cutoff — the
    // fact table must never shuffle here.
    Q("j2_fk_join",
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("revenue")),
      Some(s"""SELECT n_name, COUNT(*) AS n_orders, ${exactSumSql("o_totalprice")} AS revenue
               FROM orders
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name""".stripMargin),
      headline = true),

    // K3 — anti-join idempotency shape: app.py:392–394 (dedup-by-PK effect)
    Q("k3_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)")),

    // Semi join (EXISTS) — §2.3 extension surface
    Q("j_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)")),

    // S7 — ISO-8601 duration parse: durations synthesized from integer
    // columns (incl. absent-component cases when a part is 0), parsed with
    // the engine's regexp composition; the oracle computes the arithmetic
    // directly, so any parser defect mismatches. app.py:110–126
    Q("s7_duration_parse",
      (s, d) => {
        val h = col("l_linenumber") % 24
        val m = col("l_partkey") % 60
        val sec = col("l_suppkey") % 60
        val dur = concat(lit("PT"),
          when(h > 0, concat(h.cast("string"), lit("H"))).otherwise(""),
          when(m > 0, concat(m.cast("string"), lit("M"))).otherwise(""),
          when(sec > 0, concat(sec.cast("string"), lit("S"))).otherwise(""))
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            Durations.parseIso8601Duration(dur).cast("long").as("dur_seconds"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
                CAST((l_linenumber % 24) * 3600 + (l_partkey % 60) * 60 + (l_suppkey % 60) AS BIGINT) AS dur_seconds
              FROM lineitem""".stripMargin)),

    // P5/P6 — timestamp parse-free ops: year/month extraction, date format,
    // month truncation: app.py:220–223,335,383
    Q("p5_p6_timestamp_ops",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date_str"),
        date_trunc("month", col("o_orderdate")).as("o_month_start")),
      Some("""SELECT o_orderkey,
                CAST(year(o_orderdate) AS INTEGER) AS o_year,
                CAST(month(o_orderdate) AS INTEGER) AS o_month,
                strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month_start
              FROM orders""".stripMargin)),

    // P10 — date arithmetic surface: datediff / date_add / last_day /
    // day-of-week (Spark dayofweek = DuckDB dayofweek + 1, both anchored
    // Sunday).
    Q("p10_date_arith",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since_95"),
        date_add(col("o_orderdate"), 30).as("due_date"),
        last_day(col("o_orderdate")).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow")),
      Some("""SELECT o_orderkey,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow
        |FROM orders""".stripMargin)),

    // P11 — string scalar-function surface.
    Q("p11_string_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        length(col("c_name")).as("name_len"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_dist"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name")),
      Some("""SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
        |  concat_ws('|', c_mktsegment, c_name) AS seg_name
        |FROM customer""".stripMargin)),

    // Scalar subquery shape: rows against a global aggregate (broadcast of
    // a 1-row derived table — no shuffle of the fact side).
    Q("p13_scalar_subquery",
      (s, d) => {
        val globalAvg = t(s, d, "orders")
          .agg((sum(col("o_totalprice").cast("decimal(20,4)")).cast("double") /
            count(lit(1))).as("global_avg"))
        t(s, d, "orders")
          .crossJoin(broadcast(globalAvg))
          .filter(col("o_totalprice") > col("global_avg"))
          .select("o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin)),

    // LIKE-pattern filters.
    Q("p14_like",
      (s, d) => t(s, d, "part")
        .filter(col("p_type").like("%ECONOMY%") || col("p_name").startsWith("red"))
        .select("p_partkey", "p_name", "p_type"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE '%ECONOMY%' OR p_name LIKE 'red%'""".stripMargin)),

    // HAVING (post-aggregation filter).
    Q("a14_having",
      (s, d) => t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin)),

    // UNION DISTINCT (vs u1's UNION ALL semantics).
    Q("set_union_distinct",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct(),
      Some("SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier")),

    // P3 — null-default projection (`.get(k, default)` semantics): app.py:307–314
    Q("p3_null_default",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("N/A")).as("segment_or_default")),
      Some("SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS segment_or_default FROM customer")),

    // P4 — the DataFrameNaFunctions surface (na.fill / na.replace), judged:
    // nulls are synthesized (the test tables ship none), then filled with
    // per-column constants and value-replaced — the fill-constant path the
    // reference holds behind its first-load branch (app.py:236-239).
    Q("p23_na_fill",
      (s, d) => t(s, d, "customer")
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("segment"),
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
        .na.fill(Map("segment" -> "N/A", "bal" -> 0.0))
        .na.replace("segment", Map("MACHINERY" -> "MACH")),
      Some("""SELECT c_custkey,
        |  CASE COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A')
        |    WHEN 'MACHINERY' THEN 'MACH'
        |    ELSE COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') END AS segment,
        |  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
        |FROM customer""".stripMargin)),

    // P2 — int casts (floor contract: Spark truncates double→long, DuckDB
    // rounds, so both sides floor explicitly): app.py:225–233
    Q("p2_cast_projection",
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("long").as("qty_int"),
        // decimal cast is the operator under test; the judged column is its
        // canonical string form — a DECIMAL output cell degrades to float64
        // in the driver's compare and loses its trailing zeros
        col("l_extendedprice").cast("decimal(18,2)").cast("string").as("price_dec")),
      Some("""SELECT l_orderkey, l_linenumber,
                CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
              FROM lineitem""".stripMargin))
  )
}

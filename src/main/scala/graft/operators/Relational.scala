package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational query surface over the driver's star schema — the
  * engine-surface ops for every category the reference lacks (SURVEY.md
  * §2.6: joins, windows, sorts/top-k, set ops, scalar fns, rollup,
  * distinct).
  *
  * Scale decisions, chosen for a 1000-executor / 100 TB deployment and
  * identical in local mode:
  *  - Dimension tables (`region` 5 rows, `nation` 25, `supplier`,
  *    `part`, even `customer`) are broadcast — dimension size grows
  *    ~linearly with SF but stays MBs at 100 TB fact scale, so every
  *    fact⋈dim join here is a map-side `BroadcastHashJoin`: zero shuffle
  *    of the fact table.
  *  - `lineitem ⋈ orders` is the one genuinely large join; it shuffles
  *    both sides on the order key (sort-merge / shuffled-hash picked by
  *    Catalyst + AQE). Nothing else shuffles the fact tables twice.
  *  - Aggregations rely on Catalyst partial aggregation (map-side
  *    combine); output cardinality is group-count, not row-count.
  *  - Top-k uses `orderBy(...).limit(k)` which Spark plans as
  *    `TakeOrderedAndProject` — per-partition heap + single merge, no
  *    global sort.
  *
  * Output typing convention (oracle parity): integer results are cast to
  * LongType and money/ratio aggregates are rounded, so the Spark parquet
  * dump and the DuckDB oracle produce byte-identical values.
  */
object Relational {

  /** Register a dir-scoped temp view (name embeds the dir hash): fixed
    * names would race when one session runs queries against different
    * dirs concurrently. Returns the view name to splice into SQL. */
  private def view(spark: SparkSession, dir: String, table: String): String = {
    val v = s"v_${table}_${Integer.toHexString(dir.hashCode & Int.MaxValue)}"
    Tables.table(spark, dir, table).createOrReplaceTempView(v)
    v
  }

  /** q10: TPC-H Q1-style pricing summary — full-scan partial/final hash
    * aggregate over lineitem; the canonical scan-bound query. */
  def q10PricingSummary(spark: SparkSession, dir: String): DataFrame =
    // money sums on the EXACT 2-dp integer grid (the q155/q190 rule):
    // a float Σ over the corpus is accumulation-order-sensitive, and
    // the round-10 100× hash sweep caught exactly that here —
    // sum_base_price 283913704430.98 (Spark partial sums) vs …431.0
    // (DuckDB sequential) at 60M rows. Quantities/prices/discounts are
    // 2-dp data, so every moment is an exact decimal(38,0) integer and
    // the only doubles are the final closed-form divisions.
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) <= to_date(lit("1998-09-02")))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100, 0).cast("long").as("q2"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("p2"),
        round((lit(1.0) - col("l_discount")) * 100, 0).cast("long").as("d2"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("q2").cast("decimal(38,0)")).as("sq"),
        sum(col("p2").cast("decimal(38,0)")).as("sp"),
        sum(col("p2").cast("decimal(38,0)") * col("d2").cast("decimal(38,0)"))
          .as("sd"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("sq").cast("double") / 100.0, 2).as("sum_qty"),
        round(col("sp").cast("double") / 100.0, 2).as("sum_base_price"),
        round(col("sd").cast("double") / 10000.0, 0).as("sum_disc_price"),
        round(col("sq").cast("double") / 100.0 / col("n_rows"), 4).as("avg_qty"),
        round(col("sp").cast("double") / 100.0 / col("n_rows"), 4).as("avg_price"),
        col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q11: customer ⋈ nation ⋈ region, both dims broadcast. */
  def q11JoinDims(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 2).as("sum_acctbal"),
        round(avg("c_acctbal"), 4).as("avg_acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** q12: TPC-H Q3-style top revenue orders: broadcast the filtered
    * customer dim into orders, shuffle-join orders ⋈ lineitem on the
    * order key, top-10 via TakeOrderedAndProject. */
  def q12TopRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "FURNITURE")
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) < to_date(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer scales with the data — size-guarded hint, not a hard
    // one; the guard checkpoints, so column refs must come from the
    // guarded frame, not the original
    val cG = Guard.modelBroadcast(c)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(cG, o("o_custkey") === cG("c_custkey"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** q13: left-semi join (EXISTS) — customers that have at least one
    * order, counted per nation. Semi joins ship only the join key of the
    * right side; at scale the orders side reduces to a distinct-key
    * exchange. */
  def q13JoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_with_orders"))
      .orderBy("nationkey")
  }

  /** q14: left-anti join (NOT EXISTS) — customers with no high-value
    * order. The threshold keeps the anti-side selective so the result is
    * non-trivial at every SF. */
  def q14JoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 350000.0)
      .select("o_custkey")
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_quiet"), round(sum("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** q15: ranking window — each customer's single largest order.
    * One shuffle on the partition key; deterministic tiebreak on the
    * order key. */
  def q15WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("top_orderkey"),
        col("o_totalprice").as("top_price"))
      .orderBy("custkey")
  }

  /** q16: running-total window — row_number, lag, and an unbounded-
    * preceding running sum per customer ordered by order date. */
  def q16WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("running_total",
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("rn"), col("prev_price"), col("running_total"))
      .orderBy("custkey", "orderkey")
  }

  /** q17: rollup over region → nation with the grouped-out level labeled
    * 'ALL' (COALESCE keeps the output dialect-neutral vs GROUPING()).
    * Expressed through the SQL surface: the rollup's Expand node
    * duplicates grouping attributes, which Spark 4's ambiguous-lineage
    * check rejects when referenced via Dataset columns — the SQL analyzer
    * resolves the same plan cleanly, and Catalyst still broadcasts the
    * dims. */
  def q17Rollup(spark: SparkSession, dir: String): DataFrame = {
    val (c, n, r) = (view(spark, dir, "customer"), view(spark, dir, "nation"), view(spark, dir, "region"))
    spark.sql(
      s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         |       count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
         |FROM $c JOIN $n ON c_nationkey = n_nationkey
         |        JOIN $r ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY region, nation""".stripMargin)
  }

  /** q26: cube over market segment × order priority — all four grouping
    * sets in one pass over the Expand-multiplied input. SQL-parsed for
    * the same reason as q17. */
  def q26Cube(spark: SparkSession, dir: String): DataFrame = {
    val (c, o) = (view(spark, dir, "customer"), view(spark, dir, "orders"))
    // money on the exact 2-dp integer grid: the cube's grand-total cell
    // sums the WHOLE join — the float-Σ-order class the round-10 100×
    // sweep flagged here (…386.99 vs …387.0); q17/q54 escape only
    // because they sum integral quantities (exact in double < 2^53)
    spark.sql(
      s"""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
         |       coalesce(o_orderpriority, 'ALL') AS priority,
         |       count(*) AS n_orders,
         |       round(CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
         |           AS DECIMAL(38,0))) AS DOUBLE) / 100.0, 2) AS sum_price
         |FROM $o JOIN $c ON o_custkey = c_custkey
         |GROUP BY CUBE (c_mktsegment, o_orderpriority)
         |ORDER BY segment, priority""".stripMargin)
  }

  /** q27: array higher-order functions over the embedding vectors —
    * slice/transform/filter/aggregate, all codegen'd, the idiomatic
    * replacement for per-element UDF loops. */
  def q27ArrayFns(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        round(aggregate(transform(slice(v, 1, 8), abs(_)), lit(0.0), _ + _), 6).as("l1_head"),
        round(aggregate(transform(v, x => least(greatest(x, lit(-0.1)), lit(0.1))), lit(0.0), _ + _), 6)
          .as("clipped_sum"),
        size(filter(v, _ > 0.0)).cast("long").as("n_pos"),
        round(array_min(v), 6).as("min_val"),
        round(array_max(v), 6).as("max_val"))
      .orderBy("vec_id")
  }

  /** q28: map-typed functions — parse the JSON props into a
    * map<string,bigint>, explode to (key, value) rows, aggregate per
    * key. The map type surface the reference's stringly-typed pipeline
    * never had. */
  def q28MapFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // parse values as strings then try_cast: a single non-numeric
      // value must null that entry, not (as map<string,bigint> parsing
      // would) null the whole map and drop every key in the row
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))).as(Seq("key", "raw")))
      .select(col("key"), expr("try_cast(raw AS BIGINT)").as("val"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
        min("val").as("min_val"), max("val").as("max_val"))
      .orderBy("key")

  /** q29: pivot — daily value totals spread across event-type columns.
    * The explicit value list keeps the output schema static (required
    * for the oracle and the only sane form at scale: an unbounded pivot
    * needs a driver-side distinct first). */
  def q29Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 2))
      .orderBy("day")

  /** q51: exact percentiles — `percentile` (exact interpolated, matches
    * DuckDB quantile_cont) rather than percentile_approx, whose sketch
    * is engine-specific. Exact percentile needs the group's values
    * together (sort-based agg); at 100 TB prefer approx_percentile and
    * drop the oracle — both surfaces exist here, approx in q44's
    * family. */
  def q51Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"),
        round(expr("percentile(l_discount, 0.25)"), 6).as("p25_discount"))
      .orderBy("l_returnflag")

  /** q51b: the declared 100 TB percentile path — `approx_percentile`
    * (Greenwald-Khanna sketch) with accuracy 1000, so aggregation state
    * is O(accuracy) per group instead of q51's O(distinct values)
    * buffer (exact percentile must hold the group's values together;
    * fine at bench scale, memory-unbounded on a 100 TB fact column).
    * Sketch internals are engine-specific, so the query is declared
    * rows-only (the q44 HLL precedent); its contracts are tested
    * instead: the rank-error bound |rank(p̂) − p·n| ≤ 2n/accuracy in
    * ScaleSpec, and value agreement with q51's exact answer within
    * sketch tolerance in QueriesSpec. */
  def q51bPercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("approx_percentile(l_quantity, 0.5, 1000)"), 4).as("median_qty"),
        round(expr("approx_percentile(l_extendedprice, 0.9, 1000)"), 2).as("p90_price"),
        round(expr("approx_percentile(l_discount, 0.25, 1000)"), 6).as("p25_discount"))
      .orderBy("l_returnflag")

  /** q52: moment-based statistics — stddev/variance/correlation/skew
    * surface; all single-pass partial-aggregatable (Welford-style
    * merge), so they scale like any sum. */
  def q52Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
      .orderBy("l_returnflag")

  /** q53: correlated scalar subquery — customers above their nation's
    * average balance. Catalyst decorrelates it into an aggregate +
    * join; the SQL surface mirrors what an analyst would write. */
  def q53ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val cv = view(spark, dir, "customer")
    spark.sql(
      s"""SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal
         |FROM $cv c
         |WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal) * 1.5, 2) FROM $cv c2
         |                   WHERE c2.c_nationkey = c.c_nationkey)
         |ORDER BY c_custkey""".stripMargin)
  }

  /** q54: explicit GROUPING SETS — region-only and nation-only margins
    * in one pass (rollup/cube's general form; SQL-parsed like q17). */
  def q54GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val (c, n, r) = (view(spark, dir, "customer"), view(spark, dir, "nation"), view(spark, dir, "region"))
    spark.sql(
      s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         |       count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
         |FROM $c JOIN $n ON c_nationkey = n_nationkey
         |        JOIN $r ON n_regionkey = r_regionkey
         |GROUP BY GROUPING SETS ((r_name), (n_name))
         |ORDER BY region, nation""".stripMargin)
  }

  /** q55: distribution window functions — ntile quartiles, percent_rank,
    * cume_dist, first/last order price per customer. */
  def q55WindowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first("o_totalprice").over(wAll).as("first_price"),
        last("o_totalprice").over(wAll).as("last_price"))
      .orderBy("custkey", "orderkey")
  }

  /** q18: set operations over the nation-key domains of customers vs
    * suppliers — UNION / INTERSECT / EXCEPT, tagged into one result. */
  def q18SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").cast("long").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").cast("long").as("nationkey")).distinct()
    val u = cn.union(sn).distinct().withColumn("op", lit("union"))
    val i = cn.intersect(sn).withColumn("op", lit("intersect"))
    val e = cn.except(sn).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e)
      .select("op", "nationkey")
      .orderBy("op", "nationkey")
  }

  /** q19: scalar-function sweep — date parts, regexp extraction, string
    * and math functions; all codegen'd built-ins, no UDFs. */
  def q19ScalarFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        expr("try_cast(regexp_extract(o_orderpriority, '^(\\\\d+)', 1) AS BIGINT)").as("prio_num"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
        round(log10(col("o_totalprice")), 4).as("log_price"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long").as("days_since_95"))
      .orderBy("o_orderkey")

  /** q20: JSON extraction over events.props + grouped aggregate. */
  def q20JsonEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("k"), 4).as("avg_k"))
      .orderBy("event_type")

  /** q21: batch time-window aggregation — daily tumbling windows over the
    * events table (the reference is batch-only; SURVEY.md §2.6 keeps
    * stream semantics as batch window group-bys this cycle). */
  def q21TimeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day", "event_type")

  /** The q108 day window, shared with its oracle SQL so the two bounds
    * can never drift: the second fixture week (the driver testdata spans
    * 2024-01-01..2024-01-30 at every SF). */
  val Q108From  = "2024-01-08"
  val Q108Until = "2024-01-15"

  /** q108: q21's daily aggregation, day-BOUNDED through
    * [[Tables.eventsBetween]] — the graded surface for the partitioned
    * events layout. On the flat driver layout the bound is a pushed
    * `ts` range; pointed at a `event_date=` tree
    * ([[Tables.writeEventsPartitionedByDay]]) the same plan prunes whole
    * day directories (ScaleSpec asserts PartitionFilters + numFiles on
    * THIS declared query). At 100 TB this is the difference between
    * scanning a week and scanning all history. */
  def q108DayBoundedWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsBetween(spark, dir, Q108From, Q108Until)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day", "event_type")

  /** q101: retention cohorts — the week a user first appears is their
    * cohort; count how many of each cohort come back in each later
    * week. The classic product-analytics retention matrix, emitted as
    * (cohort_week, week_offset, n_active, cohort_size, retention).
    *
    * Scale shape: each user collapses to (cohort_week, distinct weeks)
    * in one partial-agged groupBy (the week set is bounded by history
    * length, not event count); the cells and cohort-size aggregations
    * branch off that subtree. Catalyst prunes the branches differently
    * (the size branch never reads the week array), so the plan runs two
    * NARROW scans rather than materializing an O(users × weeks)
    * intermediate — still down from the join-based form's three scans
    * and three user shuffles of the full table. The final matrix is
    * O(weeks²) rows. */
  def q101RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val perUser = e.groupBy("user_id")
      .agg(min("week").as("cohort_week"), collect_set("week").as("weeks"))
    // each user contributes exactly once per distinct active week, so a
    // plain count is the distinct-user count
    val cells = perUser
      .select(col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = perUser.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q102: ordered event funnel — users who viewed, then clicked AFTER
    * their first view, then purchased after that click: the sequence
    * constraint is what distinguishes a funnel from three filters
    * (a user who purchases before ever viewing does not convert).
    * Timestamps compare as integer microseconds on BOTH engines — the
    * normalized ingest (Tables.normalizeTs) floors any finer encoding
    * to micros, and a comparison done at different precisions per side
    * could order two sub-µs events differently.
    *
    * Scale shape: three partial-agged groupBy(user) passes, each joined
    * on the user key it already shuffled on; output is 3 rows. */
  def q102EventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val t2 = e.join(t1, "user_id")
      .filter(col("event_type") === "click" && col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val t3 = e.join(t2, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    // one declarative plan (no driver-side counts): three one-row
    // aggregates cross-joined, unpivoted to stage rows; identical
    // subtrees reuse their exchanges
    val row = t1.agg(count(lit(1)).as("n1"))
      .crossJoin(t2.agg(count(lit(1)).as("n2")))
      .crossJoin(t3.agg(count(lit(1)).as("n3")))
    row.select(expr(
      """stack(3,
        |  1L, 'view', n1,
        |    CASE WHEN n1 > 0 THEN 1.0D ELSE 0.0D END,
        |  2L, 'click_after_view', n2,
        |    CASE WHEN n1 > 0 THEN round(CAST(n2 AS DOUBLE) / n1, 6) ELSE 0.0D END,
        |  3L, 'purchase_after_click', n3,
        |    CASE WHEN n2 > 0 THEN round(CAST(n3 AS DOUBLE) / n2, 6) ELSE 0.0D END
        |) AS (stage, stage_name, n_users, conversion)""".stripMargin))
      .orderBy("stage")
  }

  /** q22: range join — lineitem shipped within 60 days of its order date.
    * Equi-key (order key) + range residual: Catalyst plans the equi part
    * as the join key and evaluates the BETWEEN as a post-join filter, so
    * this stays a hash/sort-merge join, not a cartesian. */
  def q22RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate", "l_extendedprice")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
        col("l_shipdate").between(col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 60 DAYS")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_fast_lines"), round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** q23: exact distinct aggregation (the HLL/approx twin is a rows-only
    * query — approx sketches differ across engines by design). */
  def q23DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("n_orders"),
        countDistinct("l_partkey").as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** q24: top-k parts by quantity sold — broadcast dim join + partial agg
    * + TakeOrderedAndProject. `part` SCALES with the data (unlike
    * nation/region's fixed 25/5 rows), so the hint goes through the
    * size guard and the join degrades to sort-merge at a scale factor
    * where the dim no longer fits an executor. */
  def q24TopKParts(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_quantity")
    val p = Guard.modelBroadcast(
      Tables.part(spark, dir).select("p_partkey", "p_name", "p_brand"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy("p_partkey", "p_name", "p_brand")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy(desc("sum_qty"), asc("p_partkey"))
      .limit(15)
  }

  /** q25: sessionization — gap > 30 min starts a new session; lag +
    * running sum over a per-user window, then one aggregate. The classic
    * event-pipeline window pattern; one shuffle on user_id. */
  def q25Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(
        max("session_id").as("n_sessions"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** q80: trailing z-score anomaly detection — per user, each event's
    * value scored against the mean/stddev of its previous 20 events
    * (exclusive frame: the current value must not contaminate its own
    * baseline); events ≥ 2.5σ from their trailing mean are flagged.
    * The standard streaming-monitor quality gate, here in its batch
    * form (the window frame IS the ring buffer a stateful stream
    * operator would keep).
    *
    * Scale shape: one shuffle on user_id; within a user the sliding
    * frame is O(1) amortized per row. Warm-up guard: a baseline needs
    * ≥ 10 observations and nonzero spread before it may flag anything
    * (stddev over a near-constant window divides by ~0 and would flag
    * every tick). Deterministic frame membership — ties on ts are
    * broken by event_id, the q25 ordering contract. */
  def q80EventZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val trailing = w.rowsBetween(-20, -1)
    Tables.events(spark, dir)
      .withColumn("n_prev", count("value").over(trailing))
      .withColumn("mu", avg("value").over(trailing))
      .withColumn("sigma", stddev_samp("value").over(trailing))
      .filter(col("n_prev") >= 10 && col("sigma") > 1e-12)
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) >= 2.5)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        round(col("mu"), 6).as("trailing_mean"),
        col("n_prev"),
        round(col("z"), 4).as("z"))
      .orderBy("event_id")
  }

  /** q209: funnel step conversions with Wilson 95 % intervals — q102's
    * point rates shipped with their uncertainty (the q202 move applied
    * to proportions): the Wilson score interval is the standard small-n
    * robust band (never escapes [0,1], behaves at p≈0/1 where the Wald
    * band collapses), so "purchase-after-click fell to 31 %" only pages
    * when the bands of yesterday and today separate. Same three
    * funnel-count aggregates as q102 (exact integers); the interval is
    * closed-form arithmetic on (k, n) with a literal z — identical
    * expression tree in the oracle. */
  def q209FunnelCi(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val t2 = e.join(t1, "user_id")
      .filter(col("event_type") === "click" && col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val t3 = e.join(t2, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    val row = t1.agg(count(lit(1)).as("n1"))
      .crossJoin(t2.agg(count(lit(1)).as("n2")))
      .crossJoin(t3.agg(count(lit(1)).as("n3")))
    val steps = row.select(expr(
      """stack(2,
        |  1L, 'click_after_view', n1, n2,
        |  2L, 'purchase_after_click', n2, n3
        |) AS (step, step_name, n_denom, n_num)""".stripMargin))
      .filter(col("n_denom") > 0)
    val z = 1.959964
    val n = col("n_denom").cast("double")
    val p = col("n_num").cast("double") / n
    val z2 = lit(z * z)
    val center = (p + z2 / (lit(2.0) * n)) / (lit(1.0) + z2 / n)
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n
      + z2 / (lit(4.0) * n * n))) / (lit(1.0) + z2 / n)
    steps.select(col("step"), col("step_name"), col("n_denom"), col("n_num"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))
      .orderBy("step")
  }

  /** q193: RFM customer segmentation — the classic recency/frequency/
    * monetary quartile scoring (Hughes 1994) over the orders fact,
    * rolled up to segment cells with canonical labels: the analytics
    * query every CRM mart runs nightly, and the revenue-side twin of
    * q79's curriculum bins (same problem — global quantile scores
    * without a global rank).
    *
    * Scale shape: the fact table collapses to the per-customer
    * (recency, frequency, cents) frame in ONE partial-aggregated scan
    * (monetary on the exact cent grid — the q155 rule); the three
    * quartile boundary triples come from ONE percentile aggregate over
    * that collapsed frame and broadcast back as a single row (the q140
    * boundary pattern — deliberately NOT ntile, which would serialize
    * the frame through one window task; at 100 TB swap in
    * approx_percentile, the q51b/q140b trade). Scoring is a per-row
    * counting fold over the 3-element boundary arrays; the output is
    * O(segments) ≤ 64 cells. Boundaries round at 6 dp pre-binning
    * (the q140 cutpoint-parity contract). */
  def q193RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(max("d").as("last_d"), count(lit(1)).as("freq"),
        sum("cents").as("cents"))
    val scored = rfm
      .crossJoin(broadcast(rfm.agg(max("last_d").as("max_d"))))
      .withColumn("rec", datediff(col("max_d"), col("last_d")).cast("long"))
      .localCheckpoint() // O(customers); feeds boundaries + scoring
    val bounds = scored.agg(
      expr("transform(percentile(rec, array(0.25, 0.5, 0.75)), b -> round(b, 6)) AS rb"),
      expr("transform(percentile(freq, array(0.25, 0.5, 0.75)), b -> round(b, 6)) AS fb"),
      expr("transform(percentile(cents, array(0.25, 0.5, 0.75)), b -> round(b, 6)) AS mb"))
    val cells = scored.crossJoin(broadcast(bounds))
      .select(col("cents"), col("rec"),
        // recency: smaller = better = higher score
        (lit(4) - expr("aggregate(rb, 0, (acc, b) -> acc + if(rec > b, 1, 0))"))
          .cast("long").as("r_score"),
        (lit(1) + expr("aggregate(fb, 0, (acc, b) -> acc + if(freq > b, 1, 0))"))
          .cast("long").as("f_score"),
        (lit(1) + expr("aggregate(mb, 0, (acc, b) -> acc + if(cents > b, 1, 0))"))
          .cast("long").as("m_score"))
    cells.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("cents").cast("decimal(38,0)")).cast("double") / 100.0, 2)
          .as("segment_rev"),
        round(avg(col("rec").cast("double")), 2).as("avg_recency_days"))
      .withColumn("label",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
          "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk_loyal")
          .when(col("f_score") >= 3, "loyal")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .orderBy("r_score", "f_score", "m_score")
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The operator inventory (SURVEY.md §2) as named queries over the
  * TESTDATA tables, with DuckDB oracle SQL where expressible.
  */
object Queries {

  // Oracle-parity arithmetic: the synthetic data carries 2-decimal
  // doubles, so casting *raw columns* to decimal(18,2) is engine-agnostic
  // (the stored double is never exactly on a rounding boundary). All
  // derived math then happens in exact decimal, and the FINAL value is
  // cast back to double — decimal→double is correctly rounded in both
  // Spark and DuckDB, so results are bit-identical. Never cast a
  // *computed* double to decimal: Spark goes through Double.toString
  // (shortest repr) while DuckDB rounds the binary value, and the two
  // disagree on values like 0.615.
  private val dec = DecimalType(18, 2)
  private def d2(c: Column): Column = c.cast(dec)

  // ---- §2.4 A1/A2: aggregations -------------------------------------

  /** TPC-H Q1-style pricing summary: group-by agg with sums/counts.
    * Exercises partial aggregation (map-side combine) + single shuffle.
    * Ref: group-by aggregates, hudi-spark-minio-trino/README.md:380. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(d2(col("l_quantity"))).as("sum_qty"),
        sum(d2(col("l_extendedprice"))).as("sum_price"),
        sum(d2(col("l_extendedprice")) * (lit(1).cast(dec) - d2(col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast(DoubleType).as("sum_qty"),
        col("sum_price").cast(DoubleType).as("sum_price"),
        col("sum_disc_price").cast(DoubleType).as("sum_disc_price"), col("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** A1: group-by max + HAVING on the group key (the demo's flagship
    * query shape: hudi-spark-minio-trino/README.md:380-381). The HAVING
    * on a group column is a post-agg filter Catalyst pushes below agg. */
  def q2GroupMaxHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(max("o_totalprice").as("max_price"), count(lit(1)).as("cnt"))
      .filter(col("o_orderpriority") >= "3")
      .orderBy("o_orderpriority")

  private val q2Sql =
    """SELECT o_orderpriority, max(o_totalprice) AS max_price, count(*) AS cnt
      |FROM orders GROUP BY 1 HAVING o_orderpriority >= '3' ORDER BY 1""".stripMargin

  // ---- §2.2 P1-P3: projection + filters -----------------------------

  /** P1/P2: projection + equality filter; both pushed to the parquet
    * scan (PushedFilters + ReadSchema pruning).
    * Ref: README.md:386-389 `where symbol = 'GOOG'`. */
  def q3ProjFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  private val q3Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin

  /** P3: range predicate (the `_hoodie_commit_time > t` shape,
    * README.md:982) — here a timestamp range over orders. */
  def q4RangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1996-01-01").cast(TimestampType))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .orderBy("o_orderkey")

  private val q4Sql =
    """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      |ORDER BY o_orderkey""".stripMargin

  // ---- §2.3 J1: joins -----------------------------------------------

  /** J1: fact⋈dim inner equi-joins (customer⋈nation⋈region). nation and
    * region are tiny → Catalyst broadcast-hash joins both; only the
    * groupBy shuffles. Ref: notebook/demo.ipynb:273-276. */
  def q5JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val nat  = Tables.load(spark, dir, "nation")
    val reg  = Tables.load(spark, dir, "region")
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), sum(d2(col("c_acctbal"))).as("sum_bal"))
      .select(col("r_name"), col("n_name"), col("cnt"),
        col("sum_bal").cast(DoubleType).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  private val q5Sql =
    """SELECT r_name, n_name, count(*) AS cnt,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- §2.5 W1: latest-per-key window (the load-bearing primitive) --

  /** W1: latest-per-key via row_number window — the precombine/dedup
    * primitive behind upsert + MOR merge (README.md:226). Tie-broken by
    * event_id so the result is deterministic. */
  def q6LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  private val q6Sql =
    """SELECT user_id, event_id, event_type, value
      |FROM (SELECT user_id, event_id, event_type, value,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- §2.4 A2/A3: counts + key-uniqueness invariant ----------------

  /** A2: global count. */
  def q7Count(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  private val q7Sql = "SELECT count(*) AS cnt FROM lineitem"

  /** A3: duplicate-key detection — `group by key having count(*) > 1`
    * (the test-suite uniqueness invariant,
    * deltastreamer-hive-sync-presto.yaml:66-67). orders keys are unique
    * so this returns 0 rows; the *shape* is the operator under test. */
  def q8DupCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy("o_orderkey")

  private val q8Sql =
    """SELECT o_orderkey, count(*) AS cnt FROM orders
      |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin

  // ---- §2.5 sorts/limits, set ops; §2.3 semi/anti; §2.8 scalars -----

  /** Top-k: ORDER BY + LIMIT with deterministic tie-break. */
  def q9TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val q9Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** Semi/anti joins (EXISTS / NOT EXISTS — the delete-application
    * primitive, D5): customers with and without orders. */
  def q10SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val withO = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(true).as("has_orders"))
    val without = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(false).as("has_orders"))
    withO.unionByName(without).orderBy("c_custkey")
  }

  private val q10Sql =
    """SELECT c_custkey, TRUE AS has_orders FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, FALSE AS has_orders FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Set ops (O1/O2: union + exceptAll — the validation primitives). */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val a = li.filter(col("l_quantity") >= 25).select("l_orderkey").distinct()
    val b = li.filter(col("l_quantity") >= 45).select("l_orderkey").distinct()
    a.exceptAll(b).orderBy("l_orderkey")
  }

  private val q11Sql =
    """SELECT * FROM
      |  (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 25
      |   EXCEPT ALL
      |   SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 45)
      |ORDER BY l_orderkey""".stripMargin

  /** §2.8 scalar surface: string/date/conditional functions over
    * orders (deterministic, engine-portable set — no libm trig). */
  def q12Scalars(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio_initial"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_tag"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        round(col("o_totalprice"), -3).as("price_k"),
        abs(col("o_custkey") - 100).as("cust_dist"))
      .orderBy("o_orderkey")

  private val q12Sql =
    """SELECT o_orderkey,
      |  upper(substring(o_orderpriority, 1, 1)) AS prio_initial,
      |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_tag,
      |  year(o_orderdate) AS o_year,
      |  month(o_orderdate) AS o_month,
      |  CASE WHEN o_totalprice > 200000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
      |  round(o_totalprice, -3) AS price_k,
      |  abs(o_custkey - 100) AS cust_dist
      |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin

  /** Event-time bucketing (the tumbling-window aggregate shape, §2.9
    * extension): events per hour per type. ts is epoch-nanos long →
    * truncate to hour in integer math (engine-portable). */
  def q13TimeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("hour_bucket", expr("ts DIV 3600000000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n"), sum(d2(col("value"))).cast(DoubleType).as("sum_value"))
      .orderBy("hour_bucket", "event_type")

  private val q13Sql =
    """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Distinct aggregation (countDistinct — exact). */
  def q14Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")

  private val q14Sql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rollup subtotal aggregation (extension beyond the reference's
    * surface; grouping-set nulls ordered NULLS FIRST on both sides). */
  def q15Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum(d2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q15Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Scalar-subquery shape: customers with more orders than the
    * average per-customer order count. Integer counts; the one double
    * (avg = sum/count) is a single division, exact in both engines. */
  def q16ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val perCust = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val avgCnt = perCust.agg(avg(col("cnt")).as("avg_cnt"))
    cust.join(perCust, cust("c_custkey") === perCust("o_custkey"))
      .crossJoin(broadcast(avgCnt))
      .filter(col("cnt") > col("avg_cnt"))
      .select("c_custkey", "cnt")
      .orderBy("c_custkey")
  }

  private val q16Sql =
    """WITH pc AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1)
      |SELECT c_custkey, cnt FROM customer JOIN pc ON c_custkey = o_custkey
      |WHERE cnt > (SELECT avg(cnt) FROM pc) ORDER BY c_custkey""".stripMargin

  /** As-of join ([[graft.operators.Joins.asofJoin]]): each click event
    * picks up the user's latest view event at-or-before it — the
    * point-in-time lookup shape. Time axis is µs on BOTH sides (DuckDB
    * truncates the parquet ns timestamps to µs on read, so comparing
    * at ns would tie-break differently); views pre-deduped per
    * (user, µs) with max(value), the caller-owned tie policy. Oracle:
    * DuckDB's native ASOF LEFT JOIN — an independent implementation of
    * the same semantics. */
  def q17AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts_us")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max(col("value")).as("view_value"))
    graft.operators.Joins
      .asofJoin(clicks, views, Seq("user_id"), "ts_us", Seq("view_value"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("ts_us_asof").as("view_ts_us"), col("view_value_asof").as("view_value"))
      .orderBy("event_id")
  }

  private val q17Sql =
    """WITH clicks AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.user_id, c.event_id, c.ts_us,
      |       v.ts_us AS view_ts_us, v.view_value AS view_value
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
      |ORDER BY c.event_id""".stripMargin

  /** Binned range join ([[graft.operators.Joins.rangeJoinBinned]]):
    * events against irregular value bands as an equi-join on covering
    * bins + exact residual — never a nested-loop plan. Aggregates are
    * count/min/max (selection, not arithmetic → engine-exact). */
  def q18RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val bands = Seq(
      (0.0, 35.0), (35.0, 90.0), (90.0, 180.0), (180.0, 420.0),
      (420.0, 1000.0), (1000.0, 1000000.0)).toDF("lo", "hi")
    graft.operators.Joins.rangeJoinBinned(ev, "value", bands, "lo", "hi",
        binWidth = 50.0)
      .groupBy("lo", "hi")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy("lo")
  }

  private val q18Sql =
    """WITH bands(lo, hi) AS (VALUES
      |  (0.0, 35.0), (35.0, 90.0), (90.0, 180.0), (180.0, 420.0),
      |  (420.0, 1000.0), (1000.0, 1000000.0))
      |SELECT lo, hi, count(*) AS n, min(value) AS min_v, max(value) AS max_v
      |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
      |GROUP BY 1, 2 ORDER BY lo""".stripMargin

  /** Analytic window surface (§2.5 beyond latest-per-key): per-customer
    * order history with lag/lead navigation, dense ranking by price,
    * and a running total. One hash exchange on o_custkey feeds BOTH
    * window sorts (same partitioning, two orderings). The running sum
    * goes through decimal over a UNIQUE ordering (o_orderkey breaks
    * ties), so every prefix is engine-exact. */
  def q19WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val wTime = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(wTime))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(wTime))
      .withColumn("price_rank", rank().over(wPrice).cast(LongType))
      .withColumn("run_total",
        sum(d2(col("o_totalprice"))).over(wTime).cast(DoubleType))
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "prev_price", "next_price", "price_rank", "run_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q19Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice) OVER w_time AS prev_price,
      |  lead(o_totalprice) OVER w_time AS next_price,
      |  rank() OVER (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_time AS DOUBLE) AS run_total
      |FROM orders
      |WINDOW w_time AS (PARTITION BY o_custkey
      |                  ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** CUBE grouping sets (all four (flag, status) subtotal combinations
    * — the full-subtotal companion to q15's ROLLUP; one aggregation
    * pass, Catalyst expands the grouping sets before the shuffle). */
  def q20Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(d2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val q20Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** PIVOT: order counts per priority pivoted by status. The pivot
    * values are declared (F/O/P) so no extra distinct-values job runs
    * — the whole thing is one conditional aggregation. Empty cells are
    * coalesced to 0 to match SQL's count-over-empty-set. */
  def q21Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  private val q21Sql =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch sessionization (the gap-based session assignment behind
    * funnel/retention analytics; the batch twin of
    * [[graft.streaming.StreamOps.sessionize]]): a session breaks when
    * a user is idle > 30 min. lag + running sum over ONE window
    * partitioning (user_id) — a single hash exchange; the session
    * aggregate reuses it. Time axis in µs integers (exact in both
    * engines; ties broken by event_id). */
  def q22Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .orderBy("user_id", "session_id")
  }

  private val q22Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |s AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
      |                     THEN 1 ELSE 0 END AS brk
      |      FROM (SELECT *, lag(ts_us) OVER w AS prev FROM e
      |            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))),
      |t AS (SELECT *, (sum(brk) OVER (PARTITION BY user_id
      |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
      |      FROM s)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts_us) AS start_us, max(ts_us) AS end_us
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Exact percentiles (type-7 / linear interpolation — the same
    * definition DuckDB's `quantile_cont` and NumPy use). Distributed
    * shape: one hash aggregation; `percentile` accumulates per-group
    * value buffers, so it is for bounded-cardinality metric columns —
    * the unbounded-column scale path is `approx_percentile` (KLL-style
    * sketch, mergeable, fixed memory), whose answer is approximate and
    * therefore not oracle-gateable. Quantiles chosen (.25/.5/.75) are
    * exact binary fractions over integral doubles, so the interpolation
    * arithmetic is exact in both engines. */
  def q23Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  private val q23Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sample variance + Pearson correlation from EXACT decimal sums.
    * The built-ins (`var_samp`/`corr`) use streaming float updates whose
    * rounding differs per engine and per partition order — not
    * oracle-comparable bit-for-bit. Computing the five sufficient
    * statistics (Σx, Σy, Σx², Σy², Σxy) in decimal (exact, order-
    * independent, map-side combinable — ONE shuffle of 5 numbers per
    * group) and deriving the moments in identically-written double
    * arithmetic is deterministic on both engines AND the shape that
    * scales: sufficient statistics are the distributed-aggregation
    * answer to second-moment analytics at 100 TB.
    *
    * The decimal sums cross to double VIA A STRING round-trip
    * (`CAST(CAST(s AS STRING) AS DOUBLE)`): both engines parse
    * strings with correctly-rounded conversion, while DuckDB's direct
    * decimal-to-double scales the int128 payload in double arithmetic
    * (two roundings) - a data-dependent last-ulp divergence that
    * surfaced at sf0.001. Strings pin both sides to the single
    * correctly rounded value. */
  def q24CorrMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(d2(col("l_quantity"))).as("sx"),
        sum(d2(col("l_extendedprice"))).as("sy"),
        sum(d2(col("l_quantity")) * d2(col("l_quantity"))).as("sxx"),
        sum(d2(col("l_extendedprice")) * d2(col("l_extendedprice"))).as("syy"),
        sum(d2(col("l_quantity")) * d2(col("l_extendedprice"))).as("sxy"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        expr("(CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE) * CAST(CAST(sx AS STRING) AS DOUBLE) / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)").as("var_qty"),
        expr("(CAST(cnt AS DOUBLE) * CAST(CAST(sxy AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE) * CAST(CAST(sy AS STRING) AS DOUBLE)) / (sqrt(CAST(cnt AS DOUBLE) * CAST(CAST(sxx AS STRING) AS DOUBLE) - CAST(CAST(sx AS STRING) AS DOUBLE) * CAST(CAST(sx AS STRING) AS DOUBLE)) * sqrt(CAST(cnt AS DOUBLE) * CAST(CAST(syy AS STRING) AS DOUBLE) - CAST(CAST(sy AS STRING) AS DOUBLE) * CAST(CAST(sy AS STRING) AS DOUBLE)))").as("corr_qty_price"),
        col("cnt"))
      .orderBy("l_returnflag")

  private val q24Sql =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
      |    count(*) AS cnt
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  (CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0) AS var_qty,
      |  (CAST(cnt AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) / (sqrt(CAST(cnt AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) * sqrt(CAST(cnt AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS corr_qty_price,
      |  cnt
      |FROM s ORDER BY 1""".stripMargin

  /** Ordered string aggregation (LISTAGG / string_agg — the report-
    * formatting aggregate every warehouse ships). Deterministic order
    * comes from sorting INSIDE the aggregate (collect + array_sort),
    * not from a pre-sorted child — a global pre-sort would be a second
    * exchange Catalyst can't guarantee survives the hash agg. The
    * filter keeps group payloads bounded (this is a reporting
    * aggregate, not a data mover). */
  def q25StringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .groupBy("o_orderpriority")
      .agg(
        array_join(array_sort(collect_list(col("o_orderkey").cast(StringType))), ",").as("keys"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  private val q25Sql =
    """SELECT o_orderpriority,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ','
      |             ORDER BY CAST(o_orderkey AS VARCHAR)) AS keys,
      |  count(*) AS cnt
      |FROM orders WHERE o_orderkey % 100 = 0 GROUP BY 1 ORDER BY 1""".stripMargin

  /** Semi-structured extraction: the events `props` column is a JSON
    * string; pull a typed field out and aggregate it. `get_json_object`
    * is a codegen'd path expression — the scan stays one pass, no UDF,
    * and the JSON parse cost is per-row CPU that scales embarrassingly.
    * (For repeated multi-field access the production move is one
    * `from_json` into a struct column — same plan shape; this gate
    * covers the extraction semantics.) */
  def q26JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(when(col("k") >= 50, 1)).as("n_hi"))
      .orderBy("event_type")

  private val q26Sql =
    """WITH e AS (SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
      |  count(*) FILTER (WHERE k >= 50) AS n_hi
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** Distribution rank functions (ntile / percent_rank / cume_dist —
    * the quantile-bucketing window family q19's lag/rank set doesn't
    * cover). All four share ONE window partitioning, so the plan is a
    * single hash exchange + one sort. The filter bounds output size;
    * integer tie-break (o_orderkey) keeps ranks deterministic. */
  def q27RankFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .withColumn("bucket", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select("o_orderpriority", "o_orderkey", "bucket", "pct_rank", "cume")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private val q27Sql =
    """SELECT o_orderpriority, o_orderkey,
      |  ntile(4) OVER w AS bucket,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders WHERE o_orderkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Calendar functions (date_trunc / extract / datediff): orders per
    * month with the order's age at a fixed anchor date — the reporting
    * time-dimension shape. Integer day arithmetic (exact in both
    * engines); month emitted as a formatted string so the GROUP key is
    * engine-portable. */
  def q28Datetime(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("month", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"))
      .withColumn("dow", dayofweek(col("o_orderdate")).cast("long"))
      .groupBy("month")
      .agg(count(lit(1)).as("n"),
        sum(when(col("dow") === 1 || col("dow") === 7, 1L).otherwise(0L)).as("n_weekend"),
        max(datediff(lit("1999-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .cast("long")).as("max_age_days"))
      .orderBy("month")

  private val q28Sql =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
      |  max(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')) AS max_age_days
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Arbitrary GROUPING SETS with grouping_id — the general form CUBE
    * (q20) and ROLLUP (q15) specialize. One expand + one aggregation
    * exchange for all three granularities; grouping_id disambiguates
    * subtotal rows from genuine NULL group keys (bit semantics match
    * DuckDB's grouping()). */
  def q29GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("cnt"),
        sum(d2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first, col("gid").asc)

  private val q29Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST,
      |  gid ASC""".stripMargin

  /** RANGE-frame sliding window (value-range frames, not row-count
    * frames): per priority, the trailing-30-day order volume as of
    * each order's date. The frame key is an integer day number so
    * Spark's numeric rangeBetween and DuckDB's RANGE … PRECEDING agree
    * exactly; only peer-insensitive aggregates (sum/count/max) are
    * used because RANGE frames include order-key peers. One window
    * spec → one hash exchange + one sort. */
  def q30RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val dnum = datediff(col("o_orderdate").cast(DateType),
      lit("1990-01-01").cast(DateType)).cast("long")
    val w = Window.partitionBy("o_orderpriority").orderBy(col("dnum"))
      .rangeBetween(-30, 0)
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .withColumn("dnum", dnum)
      .withColumn("trail_sum",
        sum(d2(col("o_totalprice"))).over(w).cast(DoubleType))
      .withColumn("trail_n", count(lit(1)).over(w))
      .select("o_orderpriority", "o_orderkey", "dnum", "trail_sum", "trail_n")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private val q30Sql =
    """SELECT o_orderpriority, o_orderkey, dnum,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS trail_sum,
      |  count(*) OVER w AS trail_n
      |FROM (SELECT *, datediff('day', DATE '1990-01-01',
      |        CAST(o_orderdate AS DATE)) AS dnum
      |      FROM orders WHERE o_orderkey % 20 = 0)
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY dnum
      |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ---- §2.5+ UNPIVOT / melt (q31) -----------------------------------

  /** Wide→long reshape: four lineitem measure columns melt into
    * (metric, val) rows via `Dataset.unpivot` (Spark's UNPIVOT — an
    * Expand node, zero shuffles for the reshape itself), then a
    * per-metric aggregate. Decimal casts BEFORE the melt so the
    * summed values are exact on both engines. */
  def q31Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(18, 2)
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast(dec).as("quantity"),
        col("l_extendedprice").cast(dec).as("extendedprice"),
        col("l_discount").cast(dec).as("discount"),
        col("l_tax").cast(dec).as("tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "metric", "val")
      .groupBy("metric")
      .agg(count(lit(1)).as("cnt"),
        sum(col("val")).cast(DoubleType).as("total"))
      .orderBy("metric")
  }

  private val q31Sql =
    """SELECT metric, count(*) AS cnt, CAST(sum(val) AS DOUBLE) AS total
      |FROM (SELECT l_orderkey,
      |        CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
      |        CAST(l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
      |        CAST(l_discount AS DECIMAL(18,2)) AS discount,
      |        CAST(l_tax AS DECIMAL(18,2)) AS tax
      |      FROM lineitem)
      |  UNPIVOT (val FOR metric IN (quantity, extendedprice, discount, tax))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- §2.5+ LATERAL VIEW explode (q32) ------------------------------

  /** The SQL-surface table-generating-function path: `LATERAL VIEW
    * explode(split(...))` — Spark plans a Generate node inside the
    * scan's codegen stage; the only exchange is the aggregate's. */
  def q32LateralExplode(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents").createOrReplaceTempView("q32_docs")
    spark.sql(
      """SELECT lang, tok, count(*) AS n
        |FROM q32_docs LATERAL VIEW explode(split(text, ' ')) t AS tok
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  private val q32Sql =
    """SELECT lang, tok, count(*) AS n
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- W1+ forward fill / gap filling (q33) --------------------------

  /** Time-series forward fill: nulls (every 7th event's value, masked
    * deterministically) carry the key's last non-null observation
    * forward — `last(..., ignoreNulls)` over a running ROWS frame, the
    * IGNORE NULLS window family. One (event_type, user_id) exchange +
    * sort serves the whole fill; values pass through bit-untouched
    * (no arithmetic), so parity cannot drift. */
  def q33ForwardFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .withColumn("masked",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("filled", last(col("masked"), ignoreNulls = true).over(w))
      .select("event_type", "user_id", "event_id", "filled")
      .orderBy("event_type", "user_id", "event_id")
  }

  private val q33Sql =
    """SELECT event_type, user_id, event_id,
      |  last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
      |             IGNORE NULLS)
      |    OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM events ORDER BY event_type, user_id, event_id""".stripMargin

  // ---- L1+ LIMIT/OFFSET pagination with explicit null order (q34) ----

  /** Keyset-free pagination: ORDER BY with NULLS LAST (nulls planted
    * deterministically) + LIMIT/OFFSET through the SQL parser. OFFSET
    * plans as a GlobalLimit variant over the same TakeOrdered machinery
    * — still no full sort of the input. The tie-break on event_id keeps
    * the page deterministic. */
  def q34LimitOffset(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("q34_events")
    spark.sql(
      """SELECT event_id, masked, user_id
        |FROM (SELECT event_id, user_id,
        |        CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS masked
        |      FROM q34_events)
        |ORDER BY masked ASC NULLS LAST, event_id ASC
        |LIMIT 40 OFFSET 25""".stripMargin)
  }

  private val q34Sql =
    """SELECT event_id,
      |       CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS masked,
      |       user_id
      |FROM events
      |ORDER BY masked ASC NULLS LAST, event_id ASC
      |LIMIT 40 OFFSET 25""".stripMargin

  // ---- J+ FULL OUTER join (q35) --------------------------------------

  /** FULL OUTER equi-join of two aggregates of the same fact table —
    * per-customer 'F'-status vs 'O'-status order totals, where each
    * side genuinely has customers the other lacks (nulls on BOTH
    * sides survive to the output; counts coalesce to 0, sums stay
    * null — the conventional outer-agg shape).
    *
    * Plan: one orders scan per side with the status filter pushed
    * down, partial aggregation, and a shuffle on o_custkey that BOTH
    * the aggregates and the join reuse (the join key equals the
    * grouping key, so no extra exchange); full outer is SMJ/SHJ-able,
    * never broadcast (null-producing side can't stream). The
    * USING-style join coalesces the key. */
  def q35FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    def side(status: String, prefix: String) =
      orders.filter(col("o_orderstatus") === status)
        .groupBy("o_custkey")
        .agg(sum(d2(col("o_totalprice"))).as(s"${prefix}_total"),
          count(lit(1)).as(s"${prefix}_cnt"))
    side("F", "f").join(side("O", "o"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        col("f_total").cast(DoubleType).as("f_total"),
        coalesce(col("f_cnt"), lit(0L)).as("f_cnt"),
        col("o_total").cast(DoubleType).as("o_total"),
        coalesce(col("o_cnt"), lit(0L)).as("o_cnt"))
      .orderBy("o_custkey")
  }

  private val q35Sql =
    """WITH f AS (SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS f_total,
      |    count(*) AS f_cnt
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      |o AS (SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_total,
      |    count(*) AS o_cnt
      |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
      |SELECT o_custkey, f_total, coalesce(f_cnt, 0) AS f_cnt,
      |       o_total, coalesce(o_cnt, 0) AS o_cnt
      |FROM f FULL JOIN o USING (o_custkey) ORDER BY o_custkey""".stripMargin

  // ---- §2.2+ correlated EXISTS / NOT EXISTS through SQL (q36) --------

  /** Correlated EXISTS + NOT EXISTS subqueries through the SQL parser:
    * customers with at least one big-ticket order and no 'F'-status
    * order. Catalyst decorrelates both predicates — EXISTS rewrites to
    * a LEFT SEMI join, NOT EXISTS to a LEFT ANTI join, each a plain
    * equi-join on o_custkey with the inner filter pushed below it —
    * so the plan is q10's semi/anti shape with zero per-row subquery
    * execution (the 100 TB failure mode of naive correlation). */
  def q36ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("q36_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q36_orders")
    spark.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM q36_customer c
        |WHERE EXISTS (SELECT 1 FROM q36_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM q36_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q36Sql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ---- W1+ linear interpolation / gap filling (q37) ------------------

  /** Time-weighted LINEAR interpolation of missing values — the
    * numeric completion of q33's forward fill: nulls (planted
    * deterministically) are rebuilt from the straight line between
    * the nearest non-null neighbors, weighted by event-time distance.
    * Sequence edges degrade to the one-sided neighbor; coincident
    * timestamps guard to the previous value (no 0/0).
    *
    * Plan: ONE hash exchange + sort on (user_id, ts) serves all four
    * neighbor windows (prev/next value and timestamp — `last/first
    * ignoreNulls` over running frames share the window spec pair), so
    * the interpolation costs one shuffle of the events table
    * regardless of scale. Arithmetic is a fixed left-associated IEEE
    * chain on exact integer microsecond deltas — bit-identical in
    * both engines. */
  def q37Interpolate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("v",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
    val back = Window.partitionBy("user_id").orderBy(col("ts_us").asc,
        col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy("user_id").orderBy(col("ts_us").asc,
        col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val pv = last(col("v"), ignoreNulls = true).over(back)
    val pt = last(when(col("v").isNotNull, col("ts_us")), ignoreNulls = true)
      .over(back)
    val nv = first(col("v"), ignoreNulls = true).over(fwd)
    val nt = first(when(col("v").isNotNull, col("ts_us")), ignoreNulls = true)
      .over(fwd)
    ev.withColumn("filled",
        when(col("v").isNotNull, col("v"))
          .when(pv.isNull, nv)
          .when(nv.isNull, pv)
          .when(nt === pt, pv)
          .otherwise(pv + (nv - pv) *
            ((col("ts_us") - pt).cast(DoubleType) /
              (nt - pt).cast(DoubleType))))
      .select("event_id", "user_id", "ts_us", "v", "filled")
      .orderBy("event_id")
  }

  private val q37Sql =
    """WITH m AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |w AS (
      |  SELECT *,
      |    last_value(v IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
      |    first_value(v IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      |  FROM m)
      |SELECT event_id, user_id, ts_us, v,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pv IS NULL THEN nv
      |       WHEN nv IS NULL THEN pv
      |       WHEN nt = pt THEN pv
      |       ELSE pv + (nv - pv) *
      |         (CAST(ts_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END
      |    AS filled
      |FROM w ORDER BY event_id""".stripMargin

  // ---- §2.5+ calendar densification / recursive-CTE semantics (q38) --

  /** Calendar gap-fill: one row per calendar day across the orders date
    * span — including days with no orders — with the daily count and a
    * running cumulative total. The classic WITH RECURSIVE date-series
    * query (the oracle states it exactly that way).
    *
    * Spark-first plan: the day series is NOT built by iteration — the
    * span comes from a 1-row min/max aggregate and `sequence()` +
    * `explode` generates the calendar map-side from that single row, so
    * series construction costs zero corpus passes beyond the count
    * aggregate. The only data-sized exchange is the per-day count
    * (map-side combined); the running sum windows over the CALENDAR
    * relation (O(days), metadata-scale — a few thousand rows no matter
    * how many orders), so the unpartitioned window is not a skew risk.
    * Recursive SQL itself (Spark 4's UnionLoop) is exercised in
    * Round13Spec; this gate pins the semantics via DuckDB's
    * WITH RECURSIVE. */
  def q38CalendarFill(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderdate").cast(DateType).as("d"))
    val counts = o.groupBy("d").agg(count(lit(1)).as("n"))
    val days = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("d"))
    days.join(counts, Seq("d"), "left_outer")
      .na.fill(0L, Seq("n"))
      .withColumn("cum_n", sum(col("n")).over(
        Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)))
      // portable string day keys (the q28 convention — DATE surfaces as
      // pandas Timestamp on one side and datetime.date on the other)
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("n"), col("cum_n"))
      .orderBy("d")
  }

  private val q38Sql =
    """WITH RECURSIVE b AS (
      |  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
      |         max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      |days(d) AS (
      |  SELECT lo FROM b
      |  UNION ALL
      |  SELECT d + 1 FROM days, b WHERE d < hi),
      |c AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
      |      FROM orders GROUP BY 1)
      |SELECT strftime(days.d, '%Y-%m-%d') AS d, coalesce(c.n, 0)::BIGINT AS n,
      |  CAST(sum(coalesce(c.n, 0)) OVER (ORDER BY days.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_n
      |FROM days LEFT JOIN c ON days.d = c.d
      |ORDER BY d""".stripMargin

  // ---- W1+ running distinct count (q39) ------------------------------

  /** Running DISTINCT count over a window: after each event, how many
    * distinct event types has this user produced so far? SQL's
    * `count(DISTINCT x) OVER (...)` — which Spark's window functions
    * don't accept directly; the engine expresses it as
    * `size(collect_set(x))` over the same running frame, which is
    * exactly distinct-count-so-far.
    *
    * Plan/scale: ONE hash exchange + sort on (user_id, ts) — the same
    * single-shuffle shape as every other w-family gate. The per-row
    * state is the SET of distinct types seen, bounded by the event-type
    * domain (single digits here; for high-cardinality columns the
    * HLL-sketch path in Round10Spec is the measured alternative), so
    * window state never grows with row count. */
  def q39WindowedDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("n_types",
        size(collect_set(col("event_type")).over(w)).cast("long"))
      .select("event_id", "user_id", "ts_us", "n_types")
      .orderBy("event_id")
  }

  private val q39Sql =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  CAST(count(DISTINCT event_type) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_types
      |FROM events ORDER BY event_id""".stripMargin

  // ---- A1+ share-of-total / ratio_to_report (q40) --------------------

  /** Per-row share of its group's total — SQL's RATIO_TO_REPORT. NOT
    * a window: a partition-by-status window would funnel the whole
    * fact table through as many tasks as there are statuses (three).
    * The scalable plan is a map-side-combined aggregate to O(groups)
    * totals, broadcast back, share computed in place — one corpus
    * exchange for the agg, zero for the join. Exact decimal sums;
    * share is one double division of two correctly-rounded casts. */
  def q40ShareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        d2(col("o_totalprice")).as("p"))
    val totals = o.groupBy("o_orderstatus").agg(sum(col("p")).as("total"))
    o.join(broadcast(totals), "o_orderstatus")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("p").cast(DoubleType).as("price"),
        (col("p").cast(DoubleType) / col("total").cast(DoubleType))
          .as("share"))
      .orderBy("o_orderkey")
  }

  private val q40Sql =
    """WITH o AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      |t AS (SELECT o_orderstatus, sum(p) AS total FROM o GROUP BY 1)
      |SELECT o_orderkey, o_orderstatus, CAST(p AS DOUBLE) AS price,
      |  CAST(p AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |FROM o JOIN t USING (o_orderstatus) ORDER BY o_orderkey""".stripMargin

  // ---- A1+ OHLC downsampling / candlesticks (q41) --------------------

  /** Hourly OHLC candles per event type — THE query shape of the
    * reference's stock-ticks domain (open/close via MIN_BY/MAX_BY on
    * event time, high/low/volume as plain aggregates). One map-side-
    * combined exchange on (hour, type); open/close ride the same
    * aggregate, no window, no self-join.
    *
    * Determinism: the selection key is a zero-padded `(ts, event_id)`
    * composite string — identical lexicographic order in both engines
    * (DuckDB's arg_min can't take a struct key), and event_id breaks
    * any equal-timestamp tie. high/low/open/close are pass-through
    * doubles (no arithmetic); volume is an exact decimal sum. */
  def q41Ohlc(spark: SparkSession, dir: String): DataFrame = {
    val k = format_string("%020d-%012d", col("ts_us"), col("event_id"))
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("hour", expr("ts_us DIV 3600000000"))
      .groupBy("hour", "event_type")
      .agg(min_by(col("value"), k).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), k).as("close"),
        count(lit(1)).as("n"),
        sum(d2(col("value"))).cast(DoubleType).as("vol"))
      .orderBy("hour", "event_type")
  }

  private val q41Sql =
    """SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
      |  arg_min(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS open,
      |  max(value) AS high, min(value) AS low,
      |  arg_max(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS close,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vol
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- §2.4+ modern SQL aggregates (q42) -----------------------------

  /** The modern-SQL aggregate sugar every current engine ships and
    * analysts actually write: GROUP BY ALL (group on every non-
    * aggregated select item), COUNT_IF, ANY_VALUE — through the SQL
    * parser on both engines. ANY_VALUE is only deterministic when the
    * group's values are all equal, so it reads a column functionally
    * determined by the grouping key (the priority's first char —
    * portable and honest, rather than relying on engine-specific
    * first-row order). Plan: the same single map-side-combined
    * exchange as q1. */
  def q42ModernAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q42_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        |  any_value(substring(o_orderpriority, 1, 1)) AS prio_class
        |FROM q42_orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  private val q42Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n,
      |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
      |  any_value(substring(o_orderpriority, 1, 1)) AS prio_class
      |FROM orders
      |GROUP BY ALL
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---- W1+ ordered-sequence funnel analysis (q43) ---------------------

  /** Conversion funnel with a 24 h per-stage window: signup → first view
    * within 24 h → first click within 24 h of that view → first purchase
    * within 24 h of that click. The product-analytics query shape
    * (Amplitude/Mixpanel "ordered funnel, conversion window").
    *
    * Plan/scale: ONE user_id exchange. Each user's per-stage timestamps
    * are collected as sorted arrays inside the aggregate (state bounded
    * by per-user activity — the same bound batch sessionization q22
    * carries), and the stage chain is then resolved map-only with
    * codegen'd array HOFs: `get(filter(arr, t_prev < x <= t_prev+W), 0)`.
    * No self-joins, no per-stage passes over the corpus — a 4-stage
    * funnel at 100 TB costs exactly one shuffle. A null t_prev nulls the
    * lambda predicate, which both engines treat as not-kept, so a
    * dropped-out user stays dropped out for every later stage. */
  def q43Funnel(spark: SparkSession, dir: String): DataFrame = {
    val W = 86400000000L // 24 h in micros
    def stageArr(t: String): Column =
      sort_array(collect_list(when(col("event_type") === t, col("ts_us"))))
    def nextWithin(arr: Column, tPrev: Column): Column =
      get(filter(arr, x => x > tPrev && x <= tPrev + lit(W)), lit(0))
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .groupBy("user_id")
      .agg(get(stageArr("signup"), lit(0)).as("t1"),
        stageArr("view").as("vw"), stageArr("click").as("ck"),
        stageArr("purchase").as("pu"))
      .withColumn("t2", nextWithin(col("vw"), col("t1")))
      .withColumn("t3", nextWithin(col("ck"), col("t2")))
      .withColumn("t4", nextWithin(col("pu"), col("t3")))
      .agg(count("t1").as("n_signup"), count("t2").as("n_view"),
        count("t3").as("n_click"), count("t4").as("n_purchase"))
  }

  private val q43Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'signup'))[1] AS t1,
      |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'view')) AS vw,
      |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'click')) AS ck,
      |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')) AS pu
      |  FROM events GROUP BY user_id),
      |c AS (SELECT user_id, t1,
      |  list_filter(vw, x -> x > t1 AND x <= t1 + 86400000000)[1] AS t2, ck, pu FROM u),
      |d AS (SELECT user_id, t1, t2,
      |  list_filter(ck, x -> x > t2 AND x <= t2 + 86400000000)[1] AS t3, pu FROM c),
      |e AS (SELECT user_id, t1, t2, t3,
      |  list_filter(pu, x -> x > t3 AND x <= t3 + 86400000000)[1] AS t4 FROM d)
      |SELECT count(t1) AS n_signup, count(t2) AS n_view,
      |       count(t3) AS n_click, count(t4) AS n_purchase FROM e""".stripMargin

  // ---- W1+ cohort retention (q44) -------------------------------------

  /** Day-grain cohort retention over purchases: cohort = day of a
    * user's first purchase; cell (cohort_d, days_since) counts users
    * from that cohort who purchased again days_since days later — the
    * classic retention-triangle query.
    *
    * Plan/scale: the activity relation is pre-shrunk to distinct
    * (user, day) BEFORE the join (O(users × active days), not O(events))
    * and the cohort relation is O(users); both exchanges hash on
    * user_id so AQE can plan the join without a third shuffle. The
    * final cell aggregate is map-side combined. Each user appears at
    * most once per (cohort, day) by construction, so the DISTINCT in
    * the cell count is belt-and-braces, not a second expand pass. */
  def q44CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts DIV 1000 DIV 86400000000").as("d"))
    val cohorts = f.groupBy("user_id").agg(min("d").as("cohort_d"))
    // count(*), not count(DISTINCT): the activity relation is already
    // distinct (user, day) and the cohort join adds one row per user,
    // so each user hits a (cohort, days_since) cell at most once —
    // same value, without the distinct-expand pass the oracle's
    // COUNT(DISTINCT) spelling would cost at 100 TB
    f.distinct().join(cohorts, "user_id")
      .groupBy(col("cohort_d"), (col("d") - col("cohort_d")).as("days_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_d", "days_since")
  }

  private val q44Sql =
    """WITH f AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(d) AS cohort_d FROM f GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, d FROM f)
      |SELECT cohort_d, d - cohort_d AS days_since,
      |       count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- A1+ equi-width histogram (q45) ----------------------------------

  /** Equi-width histogram of order value (width_bucket semantics,
    * 50 000-wide buckets). The bucket id is computed in EXACT integer
    * math — price → decimal(18,2) → cents BIGINT → DIV — because a
    * double `floor(x / width)` is unportable exactly at bucket
    * boundaries, which is where histogram bugs live. DuckDB 1.0 has no
    * width_bucket; the integer formulation sidesteps it. FLOOR-division
    * semantics on BOTH engines: Spark's `DIV` truncates toward zero
    * while DuckDB's `//` floors, so the Spark side corrects negative
    * non-exact quotients down by one — prices are non-negative in this
    * data, but the operator must not silently re-bucket if reused on a
    * signed measure. One map-side-combined exchange on O(buckets)
    * groups; the scan reads one column. */
  def q45Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(d2(col("o_totalprice")).as("p"))
      .withColumn("__cents", expr("CAST(p * 100 AS BIGINT)"))
      .withColumn("bucket", expr(
        "__cents DIV 5000000 - CASE WHEN __cents < 0 AND __cents % 5000000 <> 0 THEN 1 ELSE 0 END"))
      .drop("__cents")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("p")).cast(DoubleType).as("total"))
      .orderBy("bucket")

  private val q45Sql =
    """SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         // 5000000 AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- J++ six-table star join (q46, TPC-H Q5 shape) ------------------

  /** Revenue per nation for one region and a two-year order band — the
    * TPC-H Q5 join topology (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈
    * nation ⋈ region with the "local supplier" s_nationkey =
    * c_nationkey constraint). THE join-planning stress test: Catalyst
    * must broadcast the three O(dims) relations (region filter →
    * nation → supplier), keep the selective date filter on the orders
    * scan (pushed to parquet), and shuffle only the two fact
    * relations on the join keys. At 100 TB the date band + region cut
    * shrink the orders side ~10× before the lineitem join — exactly
    * the plan AQE picks when stats flow; the plan audit in PLANS.md
    * pins it. Decimal revenue math as in q1. */
  def q46MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast(TimestampType)
    val hi = lit("1998-01-01").cast(TimestampType)
    val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables.load(spark, dir, "nation")
    val reg = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    cust
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(d2(col("l_extendedprice")) *
          (lit(1).cast(dec) - d2(col("l_discount")))).cast(DoubleType)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q46Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  // ---- J+ similarity (fuzzy) join (q47) --------------------------------

  /** Entity-resolution join: name pairs within levenshtein distance 6,
    * ordered pairs deduped by `a < b`. Dimension-scale fuzzy matching
    * is a broadcast nested-loop (the right tool for O(dims²) work);
    * CORPUS-scale fuzzy matching must never cross-join — that job
    * belongs to the LSH/containment dedup family (p3/p36/p40), which
    * generates candidates from bounded-fanout keys first. Both engines
    * implement textbook single-matrix edit distance, so `dist` is
    * integer-identical. */
  def q47FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(spark, dir, "nation").select("n_name")
    val a = n.as("a")
    val b = n.as("b")
    a.join(b, col("a.n_name") < col("b.n_name") &&
        levenshtein(col("a.n_name"), col("b.n_name")) <= 6)
      .select(col("a.n_name").as("name_a"), col("b.n_name").as("name_b"),
        levenshtein(col("a.n_name"), col("b.n_name")).cast(LongType).as("dist"))
      .orderBy("name_a", "name_b")
  }

  private val q47Sql =
    """SELECT a.n_name AS name_a, b.n_name AS name_b,
      |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
      |FROM nation a JOIN nation b ON a.n_name < b.n_name
      |WHERE levenshtein(a.n_name, b.n_name) <= 6
      |ORDER BY name_a, name_b""".stripMargin

  // ---- O1+ INTERSECT (q48) ---------------------------------------------

  /** Set intersection, completing the q11 set-op family: orders that
    * BOTH contain a high-quantity line AND a high-discount line.
    * Spark plans `intersect` as a left-semi join over the deduped
    * sides — the aggregate exchanges are the whole cost; no
    * row-matching pass survives at 100 TB beyond the two hash aggs. */
  def q48Intersect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val a = li.filter(col("l_quantity") >= 25).select("l_orderkey").distinct()
    val b = li.filter(col("l_discount") >= 0.05).select("l_orderkey").distinct()
    a.intersect(b).orderBy("l_orderkey")
  }

  private val q48Sql =
    """SELECT * FROM
      |  (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 25
      |   INTERSECT
      |   SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount >= 0.05)
      |ORDER BY l_orderkey""".stripMargin

  // ---- §2.2+ correlated scalar subquery (q49) ---------------------------

  /** A correlated scalar subquery in the SELECT list — the "how many
    * children does each parent have" idiom analysts write instead of
    * an explicit join. Catalyst decorrelates it to one aggregate +
    * LEFT OUTER equi-join (zero per-row subquery execution — the plan
    * q36 pins for EXISTS, here for the scalar form); the coalesce(0)
    * is the no-lineitem case the decorrelated outer join surfaces as
    * null. */
  def q49CorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("q49_orders")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("q49_lineitem")
    spark.sql(
      """SELECT o_orderkey,
        |  CAST(coalesce((SELECT count(*) FROM q49_lineitem
        |                 WHERE l_orderkey = o_orderkey), 0) AS BIGINT) AS n_items,
        |  (SELECT max(l_extendedprice) FROM q49_lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_price
        |FROM q49_orders
        |WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val q49Sql =
    """SELECT o_orderkey,
      |  CAST(coalesce((SELECT count(*) FROM lineitem
      |                 WHERE l_orderkey = o_orderkey), 0) AS BIGINT) AS n_items,
      |  (SELECT max(l_extendedprice) FROM lineitem
      |   WHERE l_orderkey = o_orderkey) AS max_price
      |FROM orders
      |WHERE o_orderkey % 7 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---- L1+ top-k over a join-aggregate (q50, TPC-H Q3 shape) ----------

  /** Shipping-priority top-10: the TPC-H Q3 composite — selective dim
    * filter → fact⋈fact join → per-order aggregate → ORDER BY revenue
    * LIMIT 10. The plan property under test: the final ordering is
    * TakeOrderedAndProject over the aggregate (heap of 10 per
    * partition + driver merge), never a full sort of the O(orders)
    * aggregate — the difference between seconds and a cluster-wide
    * sort at 100 TB. Ties on revenue break by l_orderkey. */
  def q50TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1997-06-30").cast(TimestampType)
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum(d2(col("l_extendedprice")) *
          (lit(1).cast(dec) - d2(col("l_discount")))).cast(DoubleType)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q50Sql =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-30'
      |  AND l_shipdate  > TIMESTAMP '1997-06-30'
      |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---- W1+ positional window values (q51) ------------------------------

  /** first_value / nth_value / last_value over an explicit running
    * frame — "what was this user's first event, second event, and
    * latest event so far" per row. Completes the window family
    * (q19 lag/lead/rank, q27 distribution ranks, q30 range frames,
    * q33 ignoreNulls fill). One (user_id) exchange + sort serves all
    * three positional functions; the (ts_us, event_id) composite
    * order key pins determinism in both engines. */
  def q51PositionalWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        first(col("event_type")).over(w).as("first_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"),
        last(col("event_type")).over(w).as("latest_type"))
      .orderBy("event_id")
  }

  private val q51Sql =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  first_value(event_type) OVER w AS first_type,
      |  nth_value(event_type, 2) OVER w AS second_type,
      |  last_value(event_type) OVER w AS latest_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |  ORDER BY epoch_us(ts) ASC, event_id ASC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_group_max_having" -> (q2GroupMaxHaving _),
    "q3_proj_filter" -> (q3ProjFilter _),
    "q4_range_filter" -> (q4RangeFilter _),
    "q5_join_agg" -> (q5JoinAgg _),
    "q6_latest_per_key" -> (q6LatestPerKey _),
    "q7_count" -> (q7Count _),
    "q8_dup_check" -> (q8DupCheck _),
    "q9_top_k" -> (q9TopK _),
    "q10_semi_anti" -> (q10SemiAnti _),
    "q11_set_ops" -> (q11SetOps _),
    "q12_scalars" -> (q12Scalars _),
    "q13_time_buckets" -> (q13TimeBuckets _),
    "q14_distinct" -> (q14Distinct _),
    "q15_rollup" -> (q15Rollup _),
    "q16_scalar_subquery" -> (q16ScalarSubquery _),
    "q17_asof_join" -> (q17AsofJoin _),
    "q18_range_join" -> (q18RangeJoin _),
    "q19_window_analytics" -> (q19WindowAnalytics _),
    "q20_cube" -> (q20Cube _),
    "q21_pivot" -> (q21Pivot _),
    "q22_sessionize" -> (q22Sessionize _),
    "q23_percentiles" -> (q23Percentiles _),
    "q24_corr_moments" -> (q24CorrMoments _),
    "q25_string_agg" -> (q25StringAgg _),
    "q26_json_extract" -> (q26JsonExtract _),
    "q27_rank_functions" -> (q27RankFunctions _),
    "q28_datetime" -> (q28Datetime _),
    "q29_grouping_sets" -> (q29GroupingSets _),
    "q30_range_frame" -> (q30RangeFrame _),
    "q31_unpivot" -> (q31Unpivot _),
    "q32_lateral_explode" -> (q32LateralExplode _),
    "q33_forward_fill" -> (q33ForwardFill _),
    "q34_limit_offset" -> (q34LimitOffset _),
    "q35_full_outer" -> (q35FullOuter _),
    "q36_exists_subquery" -> (q36ExistsSubquery _),
    "q37_interpolate" -> (q37Interpolate _),
    "q38_calendar_fill" -> (q38CalendarFill _),
    "q39_windowed_distinct" -> (q39WindowedDistinct _),
    "q40_share_of_total" -> (q40ShareOfTotal _),
    "q41_ohlc" -> (q41Ohlc _),
    "q42_modern_agg" -> (q42ModernAgg _),
    "q43_funnel" -> (q43Funnel _),
    "q44_cohort_retention" -> (q44CohortRetention _),
    "q45_histogram" -> (q45Histogram _),
    "q46_multi_join" -> (q46MultiJoin _),
    "q47_fuzzy_join" -> (q47FuzzyJoin _),
    "q48_intersect" -> (q48Intersect _),
    "q49_correlated_scalar" -> (q49CorrelatedScalar _),
    "q50_top_revenue" -> (q50TopRevenue _),
    "q51_positional_window" -> (q51PositionalWindow _),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_group_max_having" -> q2Sql,
    "q3_proj_filter" -> q3Sql,
    "q4_range_filter" -> q4Sql,
    "q5_join_agg" -> q5Sql,
    "q6_latest_per_key" -> q6Sql,
    "q7_count" -> q7Sql,
    "q8_dup_check" -> q8Sql,
    "q9_top_k" -> q9Sql,
    "q10_semi_anti" -> q10Sql,
    "q11_set_ops" -> q11Sql,
    "q12_scalars" -> q12Sql,
    "q13_time_buckets" -> q13Sql,
    "q14_distinct" -> q14Sql,
    "q15_rollup" -> q15Sql,
    "q16_scalar_subquery" -> q16Sql,
    "q17_asof_join" -> q17Sql,
    "q18_range_join" -> q18Sql,
    "q19_window_analytics" -> q19Sql,
    "q20_cube" -> q20Sql,
    "q21_pivot" -> q21Sql,
    "q22_sessionize" -> q22Sql,
    "q23_percentiles" -> q23Sql,
    "q24_corr_moments" -> q24Sql,
    "q25_string_agg" -> q25Sql,
    "q26_json_extract" -> q26Sql,
    "q27_rank_functions" -> q27Sql,
    "q28_datetime" -> q28Sql,
    "q29_grouping_sets" -> q29Sql,
    "q30_range_frame" -> q30Sql,
    "q31_unpivot" -> q31Sql,
    "q32_lateral_explode" -> q32Sql,
    "q33_forward_fill" -> q33Sql,
    "q34_limit_offset" -> q34Sql,
    "q35_full_outer" -> q35Sql,
    "q36_exists_subquery" -> q36Sql,
    "q37_interpolate" -> q37Sql,
    "q38_calendar_fill" -> q38Sql,
    "q39_windowed_distinct" -> q39Sql,
    "q40_share_of_total" -> q40Sql,
    "q41_ohlc" -> q41Sql,
    "q42_modern_agg" -> q42Sql,
    "q43_funnel" -> q43Sql,
    "q44_cohort_retention" -> q44Sql,
    "q45_histogram" -> q45Sql,
    "q46_multi_join" -> q46Sql,
    "q47_fuzzy_join" -> q47Sql,
    "q48_intersect" -> q48Sql,
    "q49_correlated_scalar" -> q49Sql,
    "q50_top_revenue" -> q50Sql,
    "q51_positional_window" -> q51Sql,
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.Tables
import graft.functions.{BloomProbe, GeoMean}
import QueryDef._

/** Relational core (SURVEY.md §2.2-2.6): projection/filter, all join
  * flavors, aggregation (incl. grouping sets/rollup/cube, UDAF, array agg),
  * window functions, sort/limit, set ops. All oracled against DuckDB.
  *
  * Scale notes are per-query in the Scaladoc — the guiding rules:
  * dims are broadcast; fact⋈fact shuffles on join keys; per-group windows
  * shuffle once on the partition key; no driver-side collection anywhere.
  */
object Relational {

  private val shipCut = lit("1998-09-02 00:00:00").cast(TimestampNTZType)

  /** q01 — TPC-H-Q1-style pricing summary: scan → filter → partial/final
    * hash agg → sort. The flagship `entry()` query. At 100 TB: 3-group
    * output, map-side partial agg does nearly all the work; one tiny
    * shuffle. */
  def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= shipCut)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${exactSumSql("l_quantity")} AS sum_qty,
       | ${exactSumSql("l_extendedprice")} AS sum_base_price,
       | ${exactSumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
       | ${exactSumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
       | ${exactAvgSql("l_quantity")} AS avg_qty,
       | ${exactAvgSql("l_extendedprice")} AS avg_price,
       | ${exactAvgSql("l_discount")} AS avg_disc,
       | count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — projection + predicate stack (comparison, BETWEEN, IN, LIKE).
    * All predicates push down to the parquet scan; projection prunes to 6
    * columns. */
  def q02(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(
        lit("1996-01-01 00:00:00").cast(TimestampNTZType),
        lit("1996-12-31 00:00:00").cast(TimestampNTZType)))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .filter(col("l_returnflag").isin("N", "A"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |  AND l_returnflag IN ('N','A')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03 — star join: fact (orders) ⋈ broadcast dims (customer→nation→
    * region). Dims are explicitly `broadcast()` — at 100 TB the fact side
    * never shuffles for this join. */
  def q03(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"))

  private val q03Sql =
    s"""SELECT r_name, count(*) AS n_orders, ${exactSumSql("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey=c_custkey
       | JOIN nation ON c_nationkey=n_nationkey
       | JOIN region ON n_regionkey=r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q04 — fact ⋈ fact shuffle join (sort-merge hinted): lineitem ⋈ orders
    * on orderkey. At 100 TB both sides hash-shuffle on the key; AQE can
    * split skewed partitions. */
  def q04(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        exactSum(col("l_quantity")).as("total_qty"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("o_orderpriority"))

  private val q04Sql =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       | ${exactSumSql("l_quantity")} AS total_qty,
       | ${exactSumSql("l_extendedprice*(1-l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
       |WHERE o_orderstatus='F'
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q05 — left outer join + agg: every customer, order count and spend
    * (0 for order-less customers). */
  def q05(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(exactSum(col("o_totalprice")), lit(0.0)).as("spent"))
      .orderBy(col("c_custkey"))

  private val q05Sql =
    s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
       | coalesce(${exactSumSql("o_totalprice")}, 0.0) AS spent
       |FROM customer LEFT JOIN orders ON c_custkey=o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** q05b — full outer join on acctbal buckets (buckets existing on only
    * one side produce genuine outer rows). */
  def q05b(s: SparkSession, d: String): DataFrame = {
    val cb = Tables.customer(s, d)
      .groupBy(floor(col("c_acctbal") / 100).as("bucket"))
      .agg(count(lit(1)).as("n_cust"))
    val sb = Tables.supplier(s, d)
      .groupBy(floor(col("s_acctbal") / 100).as("bucket"))
      .agg(count(lit(1)).as("n_supp"))
    cb.join(sb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("bucket"))
  }

  private val q05bSql =
    """WITH cb AS (SELECT CAST(floor(c_acctbal/100) AS BIGINT) AS bucket, count(*) AS n_cust FROM customer GROUP BY 1),
      |     sb AS (SELECT CAST(floor(s_acctbal/100) AS BIGINT) AS bucket, count(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(cb.bucket, sb.bucket) AS bucket,
      |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM cb FULL OUTER JOIN sb ON cb.bucket=sb.bucket
      |ORDER BY bucket""".stripMargin

  /** q06 — left semi join (EXISTS): customers with ≥1 order above 400k. */
  def q06(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** q07 — left anti join (NOT EXISTS): customers with no order above 400k. */
  def q07(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** q08 — theta (non-equi) join → broadcast nested loop. Only sane when
    * one side is tiny (here: both dims); never at fact×fact scale. */
  def q08(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") =!= col("r_regionkey"))
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"), col("r_name"))

  private val q08Sql =
    """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey <> r_regionkey
      |ORDER BY n_name, r_name""".stripMargin

  /** q09 — range (interval) join: pairs of events of the same user within
    * (0, 5min]. Implemented 100 TB-style: both sides bucketed to the 5-min
    * grid and equi-joined on (user, bucket) — the left side claims buckets
    * {b, b+1} so every in-range pair lands in exactly one equi-bucket; the
    * range predicate then filters within buckets. Candidate blowup is
    * bounded by bucket occupancy, not O(n²) per user. */
  def q09(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val bucket = floor(unix_micros(col("ts")) / lit(300000000L))
    val right = e.withColumn("b", bucket)
    val left = e.withColumn("b0", bucket)
      .withColumn("b", explode(array(col("b0"), col("b0") + 1)))
      .drop("b0")
    left.alias("x").join(right.alias("y"),
        col("x.user_id") === col("y.user_id") && col("x.b") === col("y.b") &&
        col("y.ts") > col("x.ts") &&
        col("y.ts") <= col("x.ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy(col("x.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  private val q09Sql =
    """SELECT e1.user_id AS user_id, count(*) AS n_pairs
      |FROM events e1 JOIN events e2
      |  ON e1.user_id=e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      |GROUP BY e1.user_id ORDER BY user_id""".stripMargin

  /** q10 — as-of join: for each purchase, the latest click of the same user
    * at-or-before it. Spark has no native as-of; the scalable pattern is
    * union both streams, one shuffle on the key, and a running
    * `last(_, ignoreNulls)` window — linear state, no pairwise blowup
    * (vs. the naive join+max which explodes on hot keys). */
  def q10(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
        lit(0).as("kind"), lit(-1L).as("eid"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("timestamp").as("click_ts"),
        lit(1).as("kind"), col("event_id").as("eid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(probes)
      .withColumn("asof_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("eid").as("pid"), col("user_id"),
        coalesce(unix_millis(col("asof_ts")), lit(-1L)).as("asof_ms"))
      .orderBy(col("pid"))
  }

  private val q10Sql =
    """SELECT p.event_id AS pid, p.user_id AS user_id,
      |       coalesce(epoch_ms(max(c.ts)), -1) AS asof_ms
      |FROM (SELECT * FROM events WHERE event_type='purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
      |  ON c.user_id=p.user_id AND c.ts <= p.ts
      |GROUP BY p.event_id, p.user_id ORDER BY pid""".stripMargin

  /** q182 — q10's as-of join through the WHOLE-OPERATOR extension
    * triple ([[graft.plans.AsofJoin]] logical node →
    * [[graft.plans.AsofJoinStrategy]] → [[graft.plans.AsofJoinExec]]
    * physical merge): same relation, same oracle, different machinery —
    * the custom SparkPlan declares ClusteredDistribution(user_id) +
    * (user_id, ts) ordering, EnsureRequirements plans one
    * co-partitioning exchange + sort per side, and each co-partition
    * merges with two pointers and O(1) carried state (vs q10's unioned
    * running-window form, which holds window state over both streams).
    * The driver gate hash-compares it against the same DuckDB as-of
    * SQL as q10, so the custom physical operator is oracled, not just
    * spec-tested; AsofJoinSpec adds the plan-shape assertions and a
    * brute-force property. */
  def q182(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsofJoin.asof(probes, clicks,
        keys = Seq("user_id" -> "c_user"),
        leftTimeCol = "ts", rightTimeCol = "c_ts")
      .select(col("pid"), col("user_id"),
        coalesce(unix_millis(col("c_ts")), lit(-1L)).as("asof_ms"))
      .orderBy(col("pid"))
  }

  /** q11 — exact count-distinct in two key representations (the
    * reference's dual HashSet semantics, CsvLoader.java:105-106) plus a
    * distinct aggregate alongside plain aggregates. */
  def q11(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("user_id").cast("string")).as("n_user_strs"),
        exactSum(col("value")).as("total_value"))
      .orderBy(col("event_type"))

  private val q11Sql =
    s"""SELECT event_type, count(*) AS n,
       | count(DISTINCT user_id) AS n_users,
       | count(DISTINCT CAST(user_id AS VARCHAR)) AS n_user_strs,
       | ${exactSumSql("value")} AS total_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q12 — approx count-distinct (HLL): the 100 TB-scale replacement for
    * the reference's unbounded exact HashSets. Engine-specific sketch →
    * no DuckDB oracle (±5% vs exact asserted in unit tests). */
  def q12(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy(col("event_type"))

  /** q13 — GROUPING SETS ((status,priority),(status),()) with grouping_id. */
  def q13(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("os"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("op"),
        col("gid"), col("n_orders"), col("total"))
      .orderBy(col("gid"), col("os"), col("op"))
  }

  private val q13Sql =
    s"""SELECT coalesce(o_orderstatus,'ALL') AS os, coalesce(o_orderpriority,'ALL') AS op,
       | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       | count(*) AS n_orders, ${exactSumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
       |ORDER BY gid, os, op""".stripMargin

  /** q14 — ROLLUP(status, priority). */
  def q14(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("os"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("op"),
        col("gid"), col("n_orders"), col("total"))
      .orderBy(col("gid"), col("os"), col("op"))

  private val q14Sql =
    s"""SELECT coalesce(o_orderstatus,'ALL') AS os, coalesce(o_orderpriority,'ALL') AS op,
       | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       | count(*) AS n_orders, ${exactSumSql("o_totalprice")} AS total
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY gid, os, op""".stripMargin

  /** q15 — CUBE(returnflag, linestatus) on lineitem. */
  def q15(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("total_qty"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("gid"), col("n"), col("total_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  private val q15Sql =
    s"""SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
       | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       | count(*) AS n, ${exactSumSql("l_quantity")} AS total_qty
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, rf, ls""".stripMargin

  /** q16 — custom UDAF (typed Aggregator): geometric mean of extendedprice
    * per returnflag. Log-space partials → map-side combine works. */
  def q16(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(GeoMean.agg(col("l_extendedprice")), 4).as("geomean_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q16Sql =
    """SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q17 — array agg: per-customer sorted order-key list. Sorted for
    * determinism (collect_list order is partition-dependent); serialized
    * with concat_ws because the driver's comparator can't sort raw arrays. */
  def q17(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("o_orderkey")))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  private val q17Sql =
    """SELECT o_custkey,
      |  list_aggregate(list_sort(list(o_orderkey)), 'string_agg', ',') AS order_keys,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q18 — ranking window functions + top-k per group. Spark ≥4 pushes the
    * rn<=3 filter into WindowGroupLimit, so only 3 rows per customer
    * survive the shuffle. */
  def q18(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rk"), col("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q18Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q19 — analytic window functions: lag/lead/first/last per user over
    * event time. */
  def q19(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_v"),
        lead(col("value"), 1).over(w).as("next_v"),
        first(col("value")).over(wFull).as("first_v"),
        last(col("value")).over(wFull).as("last_v"))
      .orderBy(col("event_id"))
  }

  private val q19Sql =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_v, lead(value, 1) OVER w AS next_v,
      |  first_value(value) OVER wf AS first_v, last_value(value) OVER wf AS last_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  /** q20 — aggregate-over-window with explicit frames: running sum +
    * 3-row moving sum (cents-exact integers → engine-order-independent). */
  def q20(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cents = round(col("value") * 10000, 0).cast("long")
    Tables.events(s, d)
      .withColumn("cents", cents)
      .select(col("event_id"), col("user_id"), col("value"),
        (sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 10000.0).as("running_sum"),
        (sum(col("cents")).over(w.rowsBetween(-2, Window.currentRow)) / 10000.0).as("mov_sum"),
        count(lit(1)).over(w.rowsBetween(-2, Window.currentRow)).as("mov_n"))
      .orderBy(col("event_id"))
  }

  private val q20Sql =
    """SELECT event_id, user_id, value,
      |  sum(CAST(round(value*10000) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/10000.0 AS running_sum,
      |  sum(CAST(round(value*10000) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)/10000.0 AS mov_sum,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
      |FROM events ORDER BY event_id""".stripMargin

  /** q21 — global top-k: order+limit plans as TakeOrderedAndProject (per-
    * partition top-k, then k-merge on the driver — no global sort). */
  def q21(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val q21Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q22 — set operations: union/intersect/except over acctbal buckets,
    * each branch tagged. */
  def q22(s: SparkSession, d: String): DataFrame = {
    val ck = Tables.customer(s, d).select(floor(col("c_acctbal") / 100).as("k")).distinct()
    val sk = Tables.supplier(s, d).select(floor(col("s_acctbal") / 100).as("k")).distinct()
    val inter = ck.intersect(sk).select(lit("intersect").as("op"), col("k"))
    val exCs = ck.except(sk).select(lit("except_cs").as("op"), col("k"))
    val exSc = sk.except(ck).select(lit("except_sc").as("op"), col("k"))
    val uni = ck.union(sk).distinct().select(lit("union").as("op"), col("k"))
    inter.unionByName(exCs).unionByName(exSc).unionByName(uni)
      .orderBy(col("op"), col("k"))
  }

  private val q22Sql =
    """WITH ck AS (SELECT DISTINCT CAST(floor(c_acctbal/100) AS BIGINT) AS k FROM customer),
      |     sk AS (SELECT DISTINCT CAST(floor(s_acctbal/100) AS BIGINT) AS k FROM supplier)
      |SELECT 'intersect' AS op, k FROM (SELECT k FROM ck INTERSECT SELECT k FROM sk)
      |UNION ALL SELECT 'except_cs' AS op, k FROM (SELECT k FROM ck EXCEPT SELECT k FROM sk)
      |UNION ALL SELECT 'except_sc' AS op, k FROM (SELECT k FROM sk EXCEPT SELECT k FROM ck)
      |UNION ALL SELECT 'union' AS op, k FROM (SELECT k FROM ck UNION SELECT k FROM sk)
      |ORDER BY op, k""".stripMargin

  /** q41 — pivot (cross-tab): order counts+revenue per priority, statuses
    * as columns. Plans as a single hash agg over conditional aggregates —
    * one shuffle, same as a plain groupBy at any scale. */
  def q41(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(exactSum(col("o_totalprice")))
      .na.fill(0.0)
      .orderBy(col("o_orderpriority"))

  private val q41Sql =
    s"""SELECT o_orderpriority,
       | coalesce(${exactSumSql("CASE WHEN o_orderstatus='O' THEN o_totalprice END")}, 0.0) AS "O",
       | coalesce(${exactSumSql("CASE WHEN o_orderstatus='F' THEN o_totalprice END")}, 0.0) AS "F",
       | coalesce(${exactSumSql("CASE WHEN o_orderstatus='P' THEN o_totalprice END")}, 0.0) AS "P"
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q42 — statistical aggregates: stddev/variance/correlation/covariance
    * + exact interpolated median. 4dp rounding absorbs engine last-bit
    * differences in the unstable moments math. */
  def q42(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qd"),
        round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(100000)), 4).as("median_price_approx"),
        round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("median_price"))
      .drop("median_price_approx") // engine-specific sketch — not oracled
      .orderBy(col("l_returnflag"))

  private val q42Sql =
    """SELECT l_returnflag,
      | round(stddev_samp(l_quantity), 4) AS sd_qty,
      | round(var_samp(l_quantity), 4) AS var_qty,
      | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      | round(covar_samp(l_quantity, l_discount), 4) AS covar_qd,
      | round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q48 — the SQL frontend end to end: tables registered as temp views,
    * a correlated-subquery TPC-H-style query through `spark.sql` (Catalyst
    * decorrelates it into the same join plan the DataFrame API would
    * build). Proves the `spark.sql(...)` path over our catalog surface. */
  def q48(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM v_orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND EXISTS (
         |    SELECT 1 FROM v_lineitem
         |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
  }

  private val q48Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q56 — schema-evolution union: two generations of the same feed with
    * different column sets combined by NAME with null-fill
    * (`allowMissingColumns`) — how a lake unions data written before and
    * after a schema change (positional union would silently misalign). */
  def q56(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val gen1 = o.filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast(TimestampNTZType))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val gen2 = o.filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    gen1.unionByName(gen2, allowMissingColumns = true)
      .select(col("o_orderkey"),
        coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val q56Sql =
    """WITH u AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      |SELECT o_orderkey, coalesce(o_orderpriority, 'LEGACY') AS priority, o_totalprice
      |FROM u ORDER BY o_orderkey""".stripMargin

  /** q57 — distribution window functions: ntile, percent_rank, cume_dist,
    * nth_value (completes SURVEY §2.5 W1 alongside q18's ranking trio). */
  def q57(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("o_orderkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_key"))
      .orderBy(col("o_orderkey"))
  }

  private val q57Sql =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q90 — exact order statistics per group: continuous (interpolating)
    * and discrete percentiles of l_extendedprice by return flag. Exact
    * percentile is a sort-based aggregate — at scale it shuffles once on
    * the group key like any hash agg, and the per-group sort is bounded
    * by the group's row count (the approx path for wide groups is
    * `approx_percentile`, a mergeable KLL-style sketch — test-covered,
    * not oracled, since its outputs are estimator-specific). Both
    * engines interpolate at (n-1)*p; 4dp rounding absorbs libm tail
    * bits. */
  def q90(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("p50_disc"))
      .orderBy(col("l_returnflag"))

  private val q90Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
      |  quantile_disc(l_extendedprice, 0.5) AS p50_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q94 — Z-order (Morton) layout key: bucket two join/filter dimensions
    * to 10 bits each and interleave them ([[graft.functions.ZOrderKeyExpr]],
    * codegen'd parallel bit-spread), then totally order the table by the
    * curve — the multi-dimensional clustering (`OPTIMIZE ZORDER BY`) that
    * keeps min/max row-group stats tight on BOTH source columns, so a
    * predicate on either dimension prunes storage ranges after a write.
    * The sort is an ordinary range-partitioned total sort on the key —
    * at 100 TB this is the layout job before [[graft.operators.ShardWriter]],
    * not a query-time cost. */
  def q94(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(1024)).cast("long").as("xb"),
        pmod(col("l_suppkey"), lit(1024)).cast("long").as("yb"))
      .withColumn("zkey", graft.functions.ZOrderKeyExpr(col("xb"), col("yb")))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))

  private val q94Sql = {
    // 10-bit-per-dimension Morton interleave as plain integer arithmetic
    // (one term per bit — DuckDB-side mirror of ZOrder.interleave)
    val zterms = (0 until 10).map { i =>
      s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""SELECT l_orderkey, l_linenumber, xb, yb,
      |  CAST($zterms AS BIGINT) AS zkey
      |FROM (SELECT l_orderkey, l_linenumber,
      |        l_partkey % 1024 AS xb, l_suppkey % 1024 AS yb
      |      FROM lineitem)
      |ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin
  }

  /** q95 — unpivot/melt (the inverse of q41's pivot): four measure
    * columns become (measure, value) rows per line item — the
    * wide-to-long reshape feeding ML feature stores and per-metric
    * aggregation. `Dataset.unpivot` plans as a Generate (Expand) — pure
    * map-side row generation, no shuffle until the caller aggregates. */
  def q95(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "value")
      // Spark unpivot RETAINS null measure values; DuckDB UNPIVOT drops
      // them by default — pin the (common) exclude-nulls semantics on
      // both sides so the oracle pair can't diverge on nullable input
      .where(col("value").isNotNull)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  private val q95Sql =
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
      |  SELECT l_orderkey, l_linenumber,
      |         l_quantity, l_extendedprice, l_discount, l_tax
      |  FROM lineitem)
      |UNPIVOT (value FOR measure IN
      |  (l_quantity, l_extendedprice, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** q97 — approximate quantiles: `approx_percentile` (a mergeable
    * Greenwald-Khanna-style quantile summary) at accuracy 10000, the
    * single-pass scale path next to q90's exact `percentile`. Exact
    * percentile buffers every value per group in the agg state — fine
    * per-group, fatal on a 100 TB unsplittable group; the sketch keeps
    * map-side partials at bounded size and merges associatively, so the
    * shuffle carries O(accuracy) bytes per group regardless of corpus
    * size. No oracle (sketch, engine-specific); RetrievalStatsSpec
    * bounds the rank error vs the exact result instead (SURVEY §7.4). */
  def q97(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(CAST(l_extendedprice AS DOUBLE), " +
          "array(0.25D, 0.5D, 0.9D, 0.99D), 10000)").as("ap"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        col("ap").getItem(0).as("p25"), col("ap").getItem(1).as("p50"),
        col("ap").getItem(2).as("p90"), col("ap").getItem(3).as("p99"),
        col("n"))
      .orderBy(col("l_returnflag"))

  /** q101 — runtime-filtered shuffle join (bloom semi-join reduction,
    * [[graft.functions.BloomProbe]]): lineitem ⋈ part where only ~5% of
    * parts survive the dim predicate. A bloom over the surviving
    * `p_partkey`s (built by a scalar subquery — one tiny aggregation of
    * the already-filtered dim) pre-filters lineitem BELOW its shuffle,
    * so the sort-merge Exchange carries ~5% of the fact table instead of
    * all of it. False positives are removed by the exact join that
    * follows, so the result is bit-identical to the plain join — the
    * oracle is the un-bloomed SQL. At 100 TB this is the difference
    * between shuffling 100 TB and shuffling 5 TB; Spark's own
    * InjectRuntimeFilter produces exactly this plan when its size
    * thresholds fire, and QueryPlanSpec asserts the probe sits in the
    * fact scan stage under the Exchange. */
  def q101(s: SparkSession, d: String): DataFrame = {
    val dimPred = col("p_brand") === "Brand#4"
    val dim = Tables.part(s, d).filter(dimPred)
      .select(col("p_partkey"), col("p_size"))
    val bloom = BloomProbe.bloomOf(
      Tables.part(s, d).filter(dimPred).select(col("p_partkey")),
      col("p_partkey"), 100000L)
    Tables.lineitem(s, d)
      .filter(BloomProbe.mightContain(bloom, col("l_partkey")))
      .join(dim.hint("merge"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size"))
      .agg(
        count(lit(1)).as("n_items"),
        exactSum(col("l_quantity")).as("total_qty"),
        exactSum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_size"))
  }

  private val q101Sql =
    s"""SELECT p_size, count(*) AS n_items,
       | ${exactSumSql("l_quantity")} AS total_qty,
       | ${exactSumSql("l_extendedprice")} AS revenue
       |FROM lineitem JOIN part ON l_partkey=p_partkey
       |WHERE p_brand='Brand#4'
       |GROUP BY p_size ORDER BY p_size""".stripMargin

  /** q131 — algebraic aggregate MAINTENANCE (the incremental-ETL
    * primitive): a stored per-supplier aggregate built from the 90% base
    * fold is combined with the aggregate of a 10% delta fold — without
    * ever rescanning the base rows — and must equal the full recompute
    * (which IS the oracle: the direct GROUP BY over all of lineitem).
    * Works because count/sum/min/max form a commutative monoid over
    * partial states — the same property Spark's own partial_* map-side
    * aggregation exploits, lifted to cross-batch maintenance. At 100 TB
    * the stored agg is key-bounded (suppliers), the delta is one batch:
    * maintenance cost is O(delta) + a key-bounded merge join, not
    * O(corpus). Sums/extrema on the 1e-4 integer grid (exactSum
    * discipline) so base+delta == full bit-exactly. */
  def q131(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("fold",
        LlmOps.lcgKey(col("l_orderkey") * 8 + col("l_linenumber")) % 10)
    def partialAgg(rows: DataFrame, p: String): DataFrame =
      rows.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as(s"${p}_n"),
          sum(round(col("l_quantity") * 10000, 0).cast("long")).as(s"${p}_sq"),
          min(round(col("l_extendedprice") * 10000, 0).cast("long"))
            .as(s"${p}_minp"),
          max(round(col("l_extendedprice") * 10000, 0).cast("long"))
            .as(s"${p}_maxp"))
    val base = partialAgg(li.filter(col("fold") < 9), "b")
    val delta = partialAgg(li.filter(col("fold") === 9), "d")
    base.join(delta, Seq("l_suppkey"), "full_outer")
      .select(col("l_suppkey"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_items"),
        ((coalesce(col("b_sq"), lit(0L)) + coalesce(col("d_sq"), lit(0L))) /
          10000.0).as("sum_qty"),
        (least(coalesce(col("b_minp"), lit(Long.MaxValue)),
          coalesce(col("d_minp"), lit(Long.MaxValue))) / 10000.0)
          .as("min_price"),
        (greatest(coalesce(col("b_maxp"), lit(Long.MinValue)),
          coalesce(col("d_maxp"), lit(Long.MinValue))) / 10000.0)
          .as("max_price"))
      .orderBy(col("l_suppkey"))
  }

  /** The oracle is deliberately NOT incremental: the plain full GROUP BY.
    * Equality proves the maintenance path is lossless. */
  private val q131Sql =
    """SELECT l_suppkey, count(*) AS n_items,
      |  sum(CAST(round(l_quantity * 10000) AS BIGINT)) / 10000.0 AS sum_qty,
      |  min(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0
      |    AS min_price,
      |  max(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0
      |    AS max_price
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** q132 — SCD Type-2 interval build: turn the per-user event log into
    * validity intervals [valid_from, valid_to) with an open current row —
    * the warehouse dimension-history shape (and the point-in-time-join
    * complement of q10's as-of). One window per user partition
    * (key-partitioned, never global); timestamps surfaced as epoch
    * MICROSECONDS (BIGINT) because the engines' timestamp hash
    * representations differ while epoch integers are exact. */
  def q132(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(lead(col("ts"), 1).over(w)).as("valid_to_us"))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  private val q132Sql =
    """SELECT user_id, event_id, event_type,
      |  epoch_us(ts) AS valid_from_us,
      |  epoch_us(lead(ts, 1) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us,
      |  CAST(CASE WHEN lead(ts, 1) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM events
      |ORDER BY user_id, valid_from_us, event_id""".stripMargin

  /** q133 — extended aggregate surface: bitwise aggregates
    * (bit_and/bit_or/bit_xor — bitmap/flag-mask accumulation),
    * boolean quantifiers (bool_and/bool_or) and conditional counting
    * (count_if), grouped by return flag. All are single-pass algebraic
    * aggregates with map-side partials; booleans surface as BIGINT 0/1
    * (engine boolean hash classes differ). */
  def q133(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_linenumber")).cast("long").as("lines_and"),
        bit_or(col("l_linenumber")).cast("long").as("lines_or"),
        bit_xor(col("l_linenumber")).cast("long").as("lines_xor"),
        expr("bool_and(l_quantity > 0)").as("all_pos_b"),
        expr("bool_or(l_discount > 0.05)").as("any_disc_b"),
        expr("count_if(l_tax > 0.03)").as("n_taxed"))
      .select(col("l_returnflag"), col("lines_and"), col("lines_or"),
        col("lines_xor"),
        when(col("all_pos_b"), 1L).otherwise(0L).as("all_pos"),
        when(col("any_disc_b"), 1L).otherwise(0L).as("any_disc"),
        col("n_taxed"))
      .orderBy(col("l_returnflag"))

  private val q133Sql =
    """SELECT l_returnflag,
      |  CAST(bit_and(l_linenumber) AS BIGINT) AS lines_and,
      |  CAST(bit_or(l_linenumber) AS BIGINT) AS lines_or,
      |  CAST(bit_xor(l_linenumber) AS BIGINT) AS lines_xor,
      |  CAST(CASE WHEN bool_and(l_quantity > 0) THEN 1 ELSE 0 END AS BIGINT)
      |    AS all_pos,
      |  CAST(CASE WHEN bool_or(l_discount > 0.05) THEN 1 ELSE 0 END
      |    AS BIGINT) AS any_disc,
      |  CAST(count_if(l_tax > 0.03) AS BIGINT) AS n_taxed
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q131_incremental_agg", q131, Some(q131Sql)),
    QueryDef("q132_scd2", q132, Some(q132Sql)),
    QueryDef("q133_agg_ext", q133, Some(q133Sql)),
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_filter_project", q02, Some(q02Sql)),
    QueryDef("q03_join_broadcast", q03, Some(q03Sql)),
    QueryDef("q04_join_sortmerge", q04, Some(q04Sql)),
    QueryDef("q05_outer_join", q05, Some(q05Sql)),
    QueryDef("q05b_full_outer", q05b, Some(q05bSql)),
    QueryDef("q06_semi_join", q06, Some(q06Sql)),
    QueryDef("q07_anti_join", q07, Some(q07Sql)),
    QueryDef("q08_theta_join", q08, Some(q08Sql)),
    QueryDef("q09_range_join", q09, Some(q09Sql)),
    QueryDef("q10_asof_join", q10, Some(q10Sql)),
    QueryDef("q182_asof_exec", q182, Some(q10Sql)),
    QueryDef("q11_count_distinct", q11, Some(q11Sql)),
    QueryDef("q12_approx_distinct", q12, None),
    QueryDef("q13_grouping_sets", q13, Some(q13Sql)),
    QueryDef("q14_rollup", q14, Some(q14Sql)),
    QueryDef("q15_cube", q15, Some(q15Sql)),
    QueryDef("q16_udaf_geomean", q16, Some(q16Sql)),
    QueryDef("q17_array_agg", q17, Some(q17Sql)),
    QueryDef("q18_window_rank", q18, Some(q18Sql)),
    QueryDef("q19_window_analytic", q19, Some(q19Sql)),
    QueryDef("q20_window_frame", q20, Some(q20Sql)),
    QueryDef("q21_topk", q21, Some(q21Sql)),
    QueryDef("q22_setops", q22, Some(q22Sql)),
    QueryDef("q41_pivot", q41, Some(q41Sql)),
    QueryDef("q42_stat_aggs", q42, Some(q42Sql)),
    QueryDef("q48_sql_frontend", q48, Some(q48Sql)),
    QueryDef("q56_schema_evolution", q56, Some(q56Sql)),
    QueryDef("q57_window_dist", q57, Some(q57Sql)),
    QueryDef("q90_percentiles", q90, Some(q90Sql)),
    QueryDef("q94_zorder_layout", q94, Some(q94Sql)),
    QueryDef("q95_unpivot", q95, Some(q95Sql)),
    QueryDef("q97_approx_quantiles", q97, None),
    QueryDef("q101_bloom_join", q101, Some(q101Sql)))
}

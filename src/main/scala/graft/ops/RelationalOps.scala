package graft.ops

import graft.Tables
import graft.Tables.{dsum, davg, sqlDsum, sqlDavg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join / set / window-function capabilities over the TPC-H-ish star schema.
  *
  * The reference performs zero joins (SURVEY.md §2.3) — this group is the
  * extended relational scope the testdata invites: multi-way equi-joins with
  * Catalyst-chosen strategies, semi/anti joins, SQL window functions, and
  * two-level aggregation.
  *
  * Scale notes (100 TB design): fact-fact joins (lineitem⋈orders) shuffle on
  * the join key and are left to sort-merge + AQE; dimension joins
  * (nation/region/supplier — fixed-cardinality tables) are explicitly
  * broadcast. Customer/part sit in between: AQE's size estimate picks
  * broadcast at small SF and sort-merge at scale, which is exactly the
  * behavior we want, so no hint is pinned.
  */
object RelationalOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** TPC-H Q1-style pricing summary: scan-heavy multi-aggregate group-by.
    * Partial aggregation (map-side combine) keeps the shuffle at 6 rows.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    pricingSummaryOn(t(s, dir, "lineitem"))

  def pricingSummaryOn(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("2000-01-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3/Q10-style: 3-way join, revenue rollup, top-10.
    *
    * The fact table is pre-aggregated to per-order partials BEFORE any join
    * (exact decimal partial sums are associative, so the final rounded
    * revenue is bit-identical): the lineitem⋈orders join then moves one row
    * per order instead of one per line item — at 100 TB that's the
    * difference between shuffling the whole fact table into the join and
    * shuffling a 4× smaller pre-reduced stream. Customer attributes join
    * last, onto already-aggregated per-customer rows.
    */
  /** Per-order decimal revenue partials — the ONE definition of the
    * TPC-H-chain pre-reduce (q21/q22/q76/q98 all contract lineitem to
    * ≤|orders| rows BEFORE their orders join): the revenue expression and
    * its exact DECIMAL(38,10) precision live here and nowhere else, so a
    * change cannot silently diverge across the four consumers.
    * `withCount` adds the per-order line count (q21/q22's n_items input).
    */
  private def perOrderRevenue(li: DataFrame,
      withCount: Boolean = false): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 10)
    val rev = sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(dec)).as("rev_part")
    if (withCount) li.groupBy("l_orderkey").agg(rev, count(lit(1)).as("n_part"))
    else li.groupBy("l_orderkey").agg(rev)
  }

  def topCustomerRevenue(s: SparkSession, dir: String): DataFrame =
    topCustomerRevenueOn(t(s, dir, "lineitem"), t(s, dir, "orders"),
      t(s, dir, "customer"))

  def topCustomerRevenueOn(li: DataFrame, o: DataFrame,
      c: DataFrame): DataFrame = {
    val perOrder = perOrderRevenue(li, withCount = true)
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev_part")).as("rev_part"), sum(col("n_part")).as("n_items"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        round(col("rev_part"), 2).cast("double").as("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Q5-style: 5-way join down the region→nation→customer→orders→lineitem
    * chain. nation (25 rows) and region (5 rows) are always broadcast.
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame =
    regionRevenueOn(t(s, dir, "lineitem"), t(s, dir, "orders"),
      t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))

  def regionRevenueOn(li: DataFrame, o: DataFrame, c: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val n = broadcast(nation)
    val r = broadcast(region)
    // Same pre-reduce-before-join shape as q21: per-order partials join
    // orders, collapse to per-customer partials, and only then touch the
    // dimension chain — the broadcast joins and final 25-row rollup run on
    // ~|customer| rows, not |lineitem|.
    val perOrder = perOrderRevenue(li, withCount = true)
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev_part")).as("rev_part"), sum(col("n_part")).as("n_part"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("rev_part")), 2).cast("double").as("revenue"),
        sum(col("n_part")).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** q98: percent-of-total (RATIO_TO_REPORT) — each nation's share of its
    * region's revenue. Same pre-reduced chain as q22; the share divides
    * per-nation DECIMAL partials by a decimal window total (decimal
    * addition is exact and order-independent, so the window needs no
    * ordering discipline — a double window sum would be
    * accumulation-order-sensitive), then rounds. The window runs on the
    * ≤25-row contracted rollup, never the facts.
    */
  def revenueShare(s: SparkSession, dir: String): DataFrame =
    revenueShareOn(t(s, dir, "lineitem"), t(s, dir, "orders"),
      t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))

  def revenueShareOn(li: DataFrame, o: DataFrame, c: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val n = broadcast(nation)
    val r = broadcast(region)
    val perOrder = perOrderRevenue(li)
    val perNation = perOrder
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("rev_part")).as("rev_part"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("rev_part")).as("nat_dec"))
    perNation
      .withColumn("reg_dec",
        sum("nat_dec").over(Window.partitionBy("r_name")))
      .select(col("r_name"), col("n_name"),
        round(col("nat_dec"), 2).cast("double").as("revenue"),
        round(col("nat_dec").cast("double")
          / col("reg_dec").cast("double"), 6).as("region_share"))
      .orderBy("r_name", "n_name")
  }

  /** q99: referential-integrity audit — orphan counts along the key
    * chain (lineitem→orders→customer→nation). The data-quality gate run
    * after every load: each check is one keyed left-anti join (linear,
    * AQE-planned), unioned into a fixed 3-row report.
    */
  def integrityAudit(s: SparkSession, dir: String): DataFrame =
    integrityAuditOn(t(s, dir, "lineitem"), t(s, dir, "orders"),
      t(s, dir, "customer"), t(s, dir, "nation"))

  def integrityAuditOn(li: DataFrame, o: DataFrame, c: DataFrame,
      nation: DataFrame): DataFrame = {
    def orphanCount(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.join(parent.select(col(parentKey)),
          child(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("check_name"), col("n_orphans"))
    orphanCount("customer_no_nation", c, "c_nationkey", nation, "n_nationkey")
      .unionAll(orphanCount(
        "lineitem_no_order", li, "l_orderkey", o, "o_orderkey"))
      .unionAll(orphanCount(
        "order_no_customer", o, "o_custkey", c, "c_custkey"))
      .orderBy("check_name")
  }

  /** Left-anti join: customers with no orders since 2001 (churn scan). */
  def inactiveCustomers(s: SparkSession, dir: String): DataFrame =
    inactiveCustomersOn(t(s, dir, "customer"), t(s, dir, "orders"))

  def inactiveCustomersOn(c: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders.filter(col("o_orderdate") >= lit("2001-01-01"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_inactive"),
        // the one decimal-sum definition (oracle-stable discipline)
        Tables.dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Left-semi join: orders having at least one premium line item. */
  def premiumOrders(s: SparkSession, dir: String): DataFrame =
    premiumOrdersOn(t(s, dir, "orders"), t(s, dir, "lineitem"))

  def premiumOrdersOn(o: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem.filter(col("l_extendedprice") > lit(95000.0))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** Dimension rollup: customer⋈orders by market segment. */
  def segmentOrders(s: SparkSession, dir: String): DataFrame =
    segmentOrdersOn(t(s, dir, "customer"), t(s, dir, "orders"))

  def segmentOrdersOn(c: DataFrame, o: DataFrame): DataFrame = {
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        davg(col("o_totalprice")).as("avg_price"))
      .orderBy("c_mktsegment")
  }

  /** Part-dimension top-k: revenue by brand (AQE broadcasts part). */
  def brandRevenue(s: SparkSession, dir: String): DataFrame =
    brandRevenueOn(t(s, dir, "lineitem"), t(s, dir, "part"))

  def brandRevenueOn(li: DataFrame, p: DataFrame): DataFrame = {
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("revenue").desc, col("p_brand").asc)
      .limit(10)
  }

  /** Supplier-side rollup: revenue attributed to supplier nations. */
  def supplierNationRevenue(s: SparkSession, dir: String): DataFrame =
    supplierNationRevenueOn(t(s, dir, "lineitem"), t(s, dir, "supplier"),
      t(s, dir, "nation"))

  def supplierNationRevenueOn(li: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    val sup = broadcast(supplier)
    val n = broadcast(nation)
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(n, sup("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** SQL window function: top-3 orders per market segment (rank + qualify). */
  def topOrdersPerSegment(s: SparkSession, dir: String): DataFrame =
    topOrdersPerSegmentOn(t(s, dir, "customer"), t(s, dir, "orders"))

  def topOrdersPerSegmentOn(c: DataFrame, o: DataFrame): DataFrame = {
    // a null-price or null-key order never ranks (the heap's null-skip,
    // mirrored by the oracle's null filter — the window form parked
    // such rows at the rank tail, a slot a revenue top-k has no use
    // for).
    // score-carrying bounded-heap top-k (ScaleOps.topKPairsPerGroup):
    // the 5-valued segment key would cap a rank window at 5-task
    // parallelism, and even the salted two-window form shuffles+sorts
    // the whole joined frame once — the aggregate consumes it map-side
    // instead, and the winners' prices ride the aggregation buffer out,
    // so the join-back scan the ids-only form paid (a second pass over
    // orders just to re-read ≤ 5·3 prices) is gone
    ScaleOps.topKPairsPerGroup(
        o.join(c, o("o_custkey") === c("c_custkey")),
        Seq("c_mktsegment"),
        col("o_totalprice"), col("o_orderkey"), 3,
        "o_orderkey", "o_totalprice")
      .select("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "rank")
  }

  /** Running/lag window over the event stream (per-user sequential state). */
  def userRunningValue(s: SparkSession, dir: String): DataFrame =
    userRunningValueOn(t(s, dir, "events"))

  def userRunningValueOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .filter(col("user_id") < 10)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("running_value",
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .select("user_id", "event_id", "ts", "value", "prev_value", "running_value")
      .orderBy("user_id", "ts", "event_id")
  }

  /** Two-level aggregation: distribution of order sizes (items per order). */
  def orderSizeDistribution(s: SparkSession, dir: String): DataFrame =
    orderSizeDistributionOn(t(s, dir, "lineitem"))

  def orderSizeDistributionOn(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"))
      .groupBy("n_items")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("n_items")

  /** ROLLUP over the region→nation hierarchy: per-nation, per-region
    * subtotal, and grand-total rows from one pass (grouping-sets surface;
    * Catalyst expands the rollup before the single shuffle).
    */
  def regionRollup(s: SparkSession, dir: String): DataFrame = {
    // via spark.sql: the Dataset-API rollup trips Spark's
    // ambiguous-self-join detector when grouping columns are join
    // attributes (the rollup's Expand duplicates them); the SQL path
    // resolves by scope and plans identically.
    t(s, dir, "customer").createOrReplaceTempView("g_customer")
    t(s, dir, "nation").createOrReplaceTempView("g_nation")
    t(s, dir, "region").createOrReplaceTempView("g_region")
    s.sql(
      """SELECT /*+ BROADCAST(g_nation, g_region) */
        |  r_name, n_name, count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE)
        |    AS total_acctbal
        |FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
        |JOIN g_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** TPC-H Q17 analog — revenue in "small" orders: line items whose
    * quantity is below 20% of their part's average order quantity, rolled
    * up per brand. The textbook correlated-aggregate query, decorrelated
    * the Spark-first way: per-part averages are ONE pre-aggregation of the
    * fact table (map-side partials contract it to ~|part| rows) joined back
    * on l_partkey — a correlated subquery would rescan lineitem per part,
    * and a window-avg formulation would shuffle every line item into a
    * per-part sort instead of aggregating before the join. Threshold math
    * rides the decimal-exact davg, so the DuckDB twin agrees bit-for-bit.
    */
  def smallQuantityRevenue(s: SparkSession, dir: String): DataFrame =
    smallQuantityRevenueOn(t(s, dir, "lineitem"), t(s, dir, "part"))

  def smallQuantityRevenueOn(li: DataFrame, part: DataFrame): DataFrame = {
    val avgq = li.groupBy("l_partkey")
      .agg(davg(col("l_quantity")).as("avg_qty"))
    li.join(avgq, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .join(broadcast(part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_small_lines"),
        dsum(col("l_extendedprice")).as("lost_revenue"))
      .orderBy("p_brand")
  }

  /** q76: revenue CUBE over (region, order status) with `grouping_id` —
    * grouping-sets capability beyond q19's plain ROLLUP: one pass produces
    * detail cells, both one-dimension margins, and the grand total, each
    * tagged with the standard grouping-id bitmask (region bit high).
    *
    * Scale: same pre-reduce discipline as q21/q22 — lineitem collapses to
    * per-order decimal partials BEFORE any join, then to per-(customer,
    * status) partials before the dimension chain, dimensions broadcast —
    * plus one more contraction: the stream aggregates to the DETAIL CELLS
    * (|regions|·|statuses| rows) before the cube, so the 4-way grouping-set
    * expand multiplies ~75 rows, not the per-order stream. Decimal partials
    * are associative at every step, so cube-of-cells is bit-identical to
    * cube-of-orders. Measured at the 100× slice (same JVM): q76 7.9 s vs
    * q22's 9.6 s — the extra grouping sets are free once the expand runs on
    * contracted cells.
    */
  def revenueCube(s: SparkSession, dir: String): DataFrame =
    revenueCubeOn(t(s, dir, "lineitem"), t(s, dir, "orders"),
      t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))

  def revenueCubeOn(li: DataFrame, o: DataFrame, c: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val perOrder = perOrderRevenue(li)
    val cells = perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      // collapse to per-(customer, status) partials before the customer
      // join (the q22 shape): the dimension chain attaches to ~|customer|·
      // |statuses| rows, not one row per order
      .groupBy("o_custkey", "o_orderstatus")
      .agg(sum(col("rev_part")).as("rev_part"),
        count(lit(1)).as("n_part"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      // contract to detail cells before the expand: the cube multiplies
      // |regions|·|statuses| rows instead of one row per order
      .groupBy("r_name", "o_orderstatus")
      .agg(sum(col("rev_part")).as("rev_cell"), sum(col("n_part")).as("n_cell"))
      // cube(String*) resolves through the Dataset and tags the grouping
      // columns with its id; expand then duplicates them and the
      // ambiguous-self-join check throws. Untagged col() refs avoid it.
      .cube(col("r_name"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("n_cell")).as("n_orders"),
        round(sum(col("rev_cell")), 2).cast("double").as("revenue"))
    // positional re-alias: above a cube, NAME resolution sees both the
    // expand's output attribute and the original it duplicates and throws
    // AMBIGUOUS_SELF_JOIN — toDF sidesteps resolution entirely
    cells.toDF("r_name", "o_orderstatus", "gid", "n_orders", "revenue")
      .orderBy("gid", "r_name", "o_orderstatus")
  }

  /** q77: SCD-type-2 dimension build — each customer's order stream becomes
    * an effective-dated history: row N is valid from its order date until
    * the next order's date (null = still current), with a per-customer
    * version number. The standard warehouse "latest snapshot + history"
    * structure, built with one keyed window (no self-join).
    *
    * Scale: one shuffle keyed by `o_custkey` (millions of groups), linear
    * per-group scan; ties on order date break by order key so versioning is
    * deterministic under any executor schedule.
    */
  def orderHistoryScd(s: SparkSession, dir: String): DataFrame =
    orderHistoryScdOn(t(s, dir, "orders"))

  /** `orders` needs (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    * o_orderdate).
    */
  def orderHistoryScdOn(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("valid_from").asc, col("o_orderkey").asc)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").as("valid_from"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "version")
  }

  /** q78: key-skew profile — the diagnostic that decides between a plain
    * shuffle join, AQE skew splitting, and `ScaleOps.saltedJoin`: per-key
    * row counts bucketed by integer log2 (via binary-string length — no
    * floating log whose last-bit rounding differs across engines), with
    * key/row totals per bucket. A heavy tail at high buckets = salt.
    *
    * Scale: two-level aggregation — per-key counts shuffle at full key
    * cardinality with map-side partials; the bucket rollup is ≤64 rows.
    */
  def keySkewProfile(s: SparkSession, dir: String): DataFrame =
    keySkewProfileOn(t(s, dir, "lineitem"), "l_partkey")

  /** Profile the frequency distribution of `key` in `df`. */
  def keySkewProfileOn(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .groupBy((length(bin(col("cnt"))) - 1).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"), min("cnt").as("min_rows"),
        max("cnt").as("max_rows"), sum("cnt").as("n_rows"))
      .orderBy("log2_bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_revenue_cube" -> revenueCube,
    "q77_order_history_scd" -> orderHistoryScd,
    "q78_key_skew_profile" -> keySkewProfile,
    "q68_small_quantity_revenue" -> smallQuantityRevenue,
    "q19_region_rollup" -> regionRollup,
    "q20_pricing_summary" -> pricingSummary,
    "q21_top_customer_revenue" -> topCustomerRevenue,
    "q22_region_revenue" -> regionRevenue,
    "q23_inactive_customers" -> inactiveCustomers,
    "q24_premium_orders" -> premiumOrders,
    "q25_segment_orders" -> segmentOrders,
    "q26_brand_revenue" -> brandRevenue,
    "q27_supplier_nation_revenue" -> supplierNationRevenue,
    "q28_top_orders_per_segment" -> topOrdersPerSegment,
    "q29_user_running_value" -> userRunningValue,
    "q30_order_size_distribution" -> orderSizeDistribution,
    "q98_revenue_share" -> revenueShare,
    "q99_integrity_audit" -> integrityAudit)

  private val disc = "l_extendedprice * (1.0 - l_discount)"

  val oracle: Map[String, String] = Map(
    "q98_revenue_share" ->
      s"""WITH pn AS (SELECT r_name, n_name,
         |    sum(CAST($disc AS DECIMAL(38,10))) AS nat_dec
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY r_name, n_name)
         |SELECT r_name, n_name,
         |  CAST(round(nat_dec, 2) AS DOUBLE) AS revenue,
         |  round(CAST(nat_dec AS DOUBLE)
         |    / CAST(sum(nat_dec) OVER (PARTITION BY r_name) AS DOUBLE), 6)
         |    AS region_share
         |FROM pn ORDER BY r_name, n_name""".stripMargin,
    "q99_integrity_audit" ->
      """SELECT 'customer_no_nation' AS check_name, count(*) AS n_orphans
        |FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        |UNION ALL
        |SELECT 'lineitem_no_order' AS check_name, count(*) AS n_orphans
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'order_no_customer' AS check_name, count(*) AS n_orphans
        |FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |ORDER BY check_name""".stripMargin,
    "q76_revenue_cube" ->
      s"""WITH per_order AS (SELECT l_orderkey,
         |    sum(CAST($disc AS DECIMAL(38,10))) AS rev_part
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT r_name, o_orderstatus,
         |  CAST(GROUPING(r_name, o_orderstatus) AS BIGINT) AS gid,
         |  count(*) AS n_orders,
         |  CAST(round(sum(rev_part), 2) AS DOUBLE) AS revenue
         |FROM per_order JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY CUBE (r_name, o_orderstatus)
         |ORDER BY gid, r_name, o_orderstatus""".stripMargin,
    "q77_order_history_scd" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
        |  o_orderdate AS valid_from,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  lead(o_orderdate, 1) OVER w AS valid_to,
        |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, version""".stripMargin,
    "q78_key_skew_profile" ->
      """WITH per_key AS (SELECT l_partkey, count(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS log2_bucket,
        |  count(*) AS n_keys, min(cnt) AS min_rows, max(cnt) AS max_rows,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM per_key GROUP BY 1 ORDER BY log2_bucket""".stripMargin,
    "q68_small_quantity_revenue" ->
      s"""WITH a AS (SELECT l_partkey,
         |  ${sqlDavg("l_quantity")} AS avg_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT p.p_brand AS p_brand,
         |  count(DISTINCT l.l_partkey) AS n_parts,
         |  count(*) AS n_small_lines,
         |  ${sqlDsum("l_extendedprice")} AS lost_revenue
         |FROM lineitem l JOIN a USING (l_partkey)
         |JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE l.l_quantity < 0.2e0 * a.avg_qty
         |GROUP BY p.p_brand ORDER BY p_brand""".stripMargin,
    "q19_region_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE)
        |    AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q20_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum(disc)} AS sum_disc_price,
         |  ${sqlDsum(s"$disc * (1.0 + l_tax)")} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_top_customer_revenue" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
         |  ${sqlDsum(disc)} AS revenue, count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "q22_region_revenue" ->
      s"""SELECT r_name, n_name, ${sqlDsum(disc)} AS revenue, count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q23_inactive_customers" ->
      """SELECT c_mktsegment, count(*) AS n_inactive,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 2) AS DOUBLE)
        |    AS total_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q24_premium_orders" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders o
         |WHERE EXISTS (SELECT 1 FROM lineitem l
         |  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 95000.0)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q25_segment_orders" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total_price,
         |  ${sqlDavg("o_totalprice")} AS avg_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q26_brand_revenue" ->
      s"""SELECT p_brand, ${sqlDsum(disc)} AS revenue,
         |  ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY revenue DESC, p_brand ASC LIMIT 10""".stripMargin,
    "q27_supplier_nation_revenue" ->
      s"""SELECT n_name, ${sqlDsum(disc)} AS revenue, count(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q28_top_orders_per_segment" ->
      """SELECT c_mktsegment, rank, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL)
        |WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin,
    "q29_user_running_value" ->
      """SELECT user_id, event_id, ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_value
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q30_order_size_distribution" ->
      """SELECT n_items, count(*) AS n_orders FROM (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |  GROUP BY l_orderkey)
        |GROUP BY n_items ORDER BY n_items""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.QFn

/** Classic warehouse OLAP shapes over the TPC-H-style fixture tables —
  * the general-analytics breadth check alongside the reference-derived
  * taxi/stream/doc lanes: a full-table grouped rollup (pricing summary),
  * a selective 3-table join with top-N (shipping priority), and a
  * tight-predicate forecast scan. Each is the canonical plan you want at
  * 100 TB: filters reach the parquet scan, aggregations partial map-side,
  * the join order lets the selective dimension drive, and every float
  * aggregate is an order-free DECIMAL sum (the repo-wide determinism
  * pattern), so the DuckDB oracle hash-matches bit-for-bit.
  */
object OlapQueries {

  /** Money arithmetic is done IN DECIMAL, not rounded after a double
    * product: each factor is a clean few-decimal double (price, 1−disc,
    * 1+tax) whose decimal cast is unambiguous in both engines, the
    * decimal product and sum are exact, and only the final total drops
    * to DOUBLE. Casting a five-integer-digit product double to a
    * 12-scale decimal instead would sit right at the 17-significant-
    * digit boundary where Spark's shortest-repr cast and DuckDB's
    * exact-binary cast legally disagree. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
  private def rate(c: org.apache.spark.sql.Column) = c.cast("decimal(8,6)")

  /** Order-free money sum: the per-row decimal product is re-cast to
    * scale 6 BEFORE summing — exact here (every factor has <= 2 decimal
    * digits, so products terminate within 6), and it keeps the sum's
    * backing integer under 2^53, where DuckDB's decimal-to-double cast
    * (integer cast, then scale division) stays correctly rounded. A
    * scale-12 sum total overflows 2^53 and double-rounds off-by-one-ulp
    * against Spark's BigDecimal.toDouble. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  val queries: Map[String, QFn] = allQueries
  private lazy val allQueries: Map[String, QFn] = giniQueries ++ Map(
    // TPC-H Q1 shape: pricing summary report — the grouped full-scan
    // rollup every warehouse runs nightly. One map-side-combined shuffle
    // on a 6-group key census.
    "olap_pricing_summary" -> ((s, d) => {
      val li = graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
      li.groupBy("l_returnflag", "l_linestatus").agg(
          dsum(dec(col("l_quantity"))).as("sum_qty"),
          dsum(dec(col("l_extendedprice"))).as("sum_base_price"),
          dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount"))
            * rate(lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 shape: shipping priority — selective customer segment
    // drives a 3-table join, revenue per undelivered order, top 10.
    // The segment filter prunes customer BEFORE the join (broadcast-able
    // dim side); lineitem's date filter is pushed to its scan.
    "olap_shipping_priority" -> ((s, d) => {
      val cust = graft.Tables(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = graft.Tables(s, d, "orders")
        .filter(col("o_orderdate").cast("date") < lit("1995-03-15"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") > lit("1995-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").cast("string").as("order_date"))
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: local-supplier volume — the deep join tree
    // (lineitem→orders→customer + supplier→nation→region) with the
    // local-supplier constraint c_nationkey = s_nationkey. Region,
    // nation, and supplier are broadcast (tiny dims); the date filter
    // prunes orders at its scan; only the two fact-sized joins shuffle.
    "olap_regional_revenue" -> ((s, d) => {
      val nat = graft.Tables(s, d, "nation")
        .join(broadcast(graft.Tables(s, d, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = graft.Tables(s, d, "customer").select("c_custkey", "c_nationkey")
      val ord = graft.Tables(s, d, "orders")
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01") &&
          col("o_orderdate").cast("date") < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val supp = graft.Tables(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val li = graft.Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q14 shape: promo revenue share per ship month — conditional
    // aggregation over a broadcast part join (the last fixture table the
    // engine consumes). Both sums are exact decimal money math; the
    // share is one fixed IEEE division of identical doubles.
    "olap_promo_share" -> ((s, d) => {
      val part = graft.Tables(s, d, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
      graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
          col("l_shipdate").cast("date") < lit("1997-01-01"))
        .select(col("l_partkey"),
          substring(col("l_shipdate").cast("date").cast("string"), 1, 7)
            .as("ship_month"),
          (dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
            .as("rev"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("ship_month")
        .agg(sum(when(col("is_promo"), col("rev")).cast("decimal(18,6)"))
            .cast("double").as("promo_rev"),
          sum(col("rev").cast("decimal(18,6)")).cast("double").as("total_rev"))
        .withColumn("promo_share",
          lit(100.0) * col("promo_rev") / col("total_rev"))
        .orderBy("ship_month")
    }),

    // TPC-H Q18 shape: large-volume orders — the HAVING-over-aggregate
    // pattern done the scalable way: aggregate lineitem FIRST (map-side
    // combined, shrinks 4 rows/order to 1), filter the tiny survivor
    // set, THEN join orders and broadcast customer. Aggregating after
    // the join would shuffle the full join product instead.
    "olap_big_spenders" -> ((s, d) => {
      val big = graft.Tables(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(dec(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 250.0)
      big.join(graft.Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(graft.Tables(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").cast("string").as("order_date"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q4 shape: order-priority count over an EXISTS — expressed as
    // a LEFT SEMI join (Spark's native EXISTS plan): orders with at
    // least one returned line, counted by priority. The semi join
    // shuffles only the distinct order keys of the filtered lineitem
    // side and never duplicates order rows — the correct EXISTS shape at
    // 100 TB (an inner join + distinct would carry the multiplicity).
    "olap_priority_exists" -> ((s, d) => {
      val returned = graft.Tables(s, d, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      graft.Tables(s, d, "orders")
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01") &&
          col("o_orderdate").cast("date") < lit("1997-01-01"))
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q17 shape: small-quantity revenue — the correlated scalar
    // subquery ("below 20% of this part's average") DECORRELATED the
    // scalable way: compute the per-part average once as its own
    // aggregate, join it back, filter. The brand filter broadcasts into
    // the scan side first, so both the average and the probe run over
    // the pruned slice only. The average is an exact-decimal sum over an
    // exact count, so the 0.2×avg threshold is the same double in both
    // engines and the filter decides identically row by row.
    "olap_small_qty_revenue" -> ((s, d) => {
      val parts = graft.Tables(s, d, "part")
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val scoped = graft.Tables(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val aq = scoped.groupBy("l_partkey")
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      scoped.join(aq, "l_partkey")
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(dec(col("l_extendedprice"))) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q22 shape: churned customers — NOT EXISTS as a LEFT ANTI
    // join against the recent-order keys: the anti side shuffles only
    // the distinct custkeys of the date-pruned orders slice, and no
    // customer row is ever duplicated.
    "olap_churned_customers" -> ((s, d) => {
      val recent = graft.Tables(s, d, "orders")
        .filter(col("o_orderdate").cast("date") >= lit("2000-01-01"))
        .select("o_custkey")
      graft.Tables(s, d, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_churned"),
          dsum(dec(col("c_acctbal"))).as("total_bal"))
        .orderBy("c_nationkey")
    }),

    // TPC-H Q6 shape: forecast revenue change — a tight multi-predicate
    // scan with a single global sum; every predicate reaches the parquet
    // reader (PushedFilters), no shuffle beyond the final 1-row combine.
    "olap_revenue_forecast" -> ((s, d) => graft.Tables(s, d, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1994-01-01") &&
        col("l_shipdate").cast("date") < lit("1995-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(dec(col("l_extendedprice")) * rate(col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))),
  )

  private lazy val giniQueries: Map[String, QFn] = Map(
    // Decile table for the same concentration story Gini compresses to
    // one number: customers ranked by revenue, cut into tenths, each
    // tenth's share of the book. ntile over the census (same bound as
    // the Gini rank); share is one division of identical decimal-exact
    // doubles.
    "agg_decile_share" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = graft.Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      val deciled = rev.withColumn("decile",
        ntile(10).over(Window.orderBy(col("rev").desc, col("o_custkey"))))
      deciled.groupBy("decile")
        .agg(count(lit(1)).as("customers"),
          sum(col("rev")).cast("double").as("revenue"))
        .crossJoin(broadcast(
          rev.agg(sum(col("rev")).cast("double").as("total"))))
        .select(col("decile"), col("customers"), col("revenue"),
          (col("revenue") / col("total")).as("share"))
        .orderBy("decile")
    }),

    // Revenue-concentration report: the Gini coefficient over per-customer
    // revenue — the "do 1% of customers carry the book?" audit, the same
    // inequality lens a training-mix review applies to source weights.
    // The global rank runs over the CUSTOMER CENSUS (one row per
    // customer after the first aggregate), so the single-partition
    // window is census-bounded — swap in ops/GlobalRowNumber if even the
    // census outgrows one task. Σ i·rev stays in DECIMAL(38,2) (revenue
    // has 2 decimals, so the product is exact and the total's backing
    // integer stays far under 2^53 — see the dsum note above).
    "agg_gini_revenue" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = graft.Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      val ranked = rev.withColumn("i",
        row_number().over(Window.orderBy(col("rev"), col("o_custkey"))))
      ranked.agg(
          count(lit(1)).as("n"),
          sum(col("rev")).cast("double").as("total"),
          sum((col("i") * col("rev")).cast("decimal(38,2)")).cast("double").as("s"))
        .select(col("n").as("n_customers"), col("total").as("total_revenue"),
          ((lit(2.0) * col("s")) / (col("n") * col("total")) -
            (col("n") + lit(1.0)) / col("n")).as("gini"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "agg_decile_share" ->
      """WITH crev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders GROUP BY 1
        |), dt AS (
        |  SELECT rev,
        |    CAST(ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS INT) AS decile
        |  FROM crev
        |), tot AS (SELECT CAST(SUM(rev) AS DOUBLE) AS total FROM crev)
        |SELECT decile, count(*) AS customers,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue,
        |  CAST(SUM(rev) AS DOUBLE) / total AS share
        |FROM dt CROSS JOIN tot
        |GROUP BY decile, total ORDER BY decile""".stripMargin,

    "agg_gini_revenue" ->
      """WITH crev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders GROUP BY 1
        |), cr AS (
        |  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i
        |  FROM crev
        |), ag AS (
        |  SELECT count(*) AS n,
        |    CAST(SUM(rev) AS DOUBLE) AS total,
        |    CAST(SUM(CAST(i * rev AS DECIMAL(38,2))) AS DOUBLE) AS s
        |  FROM cr)
        |SELECT n AS n_customers, total AS total_revenue,
        |  (2.0 * s) / (n * total) - (n + 1.0) / n AS gini
        |FROM ag""".stripMargin,

    "olap_pricing_summary" ->
      """WITH base AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS DECIMAL(18,6)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,6)) AS ext,
        |    CAST(1.0 - l_discount AS DECIMAL(8,6)) AS disc1,
        |    CAST(1.0 + l_tax AS DECIMAL(8,6)) AS tax1
        |  FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |), g AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(SUM(qty) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(ext) AS DOUBLE) AS sum_base_price,
        |    CAST(SUM(CAST(ext * disc1 AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sum_disc_price,
        |    CAST(SUM(CAST(ext * disc1 * tax1 AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sum_charge,
        |    count(*) AS count_order
        |  FROM base GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
        |  sum_disc_price, sum_charge, count_order,
        |  sum_qty / count_order AS avg_qty,
        |  sum_base_price / count_order AS avg_price
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "olap_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "olap_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "olap_promo_share" ->
      """WITH pm AS (
        |  SELECT substr(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), 1, 7)
        |      AS ship_month,
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6)) END) AS DOUBLE)
        |      AS promo_rev,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE)
        |      AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  GROUP BY 1)
        |SELECT ship_month, promo_rev, total_rev,
        |  100.0 * promo_rev / total_rev AS promo_share
        |FROM pm ORDER BY ship_month""".stripMargin,

    "olap_big_spenders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT c_name, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  o_totalprice, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE total_qty > 250.0
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,

    "olap_small_qty_revenue" ->
      """WITH sc AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'
        |), aq AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |      AS avg_qty
        |  FROM sc GROUP BY 1)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  count(*) AS n_lines
        |FROM sc JOIN aq USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "olap_churned_customers" ->
      """SELECT c_nationkey, count(*) AS n_churned,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "olap_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "olap_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
  )
}

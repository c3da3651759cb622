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
      // The sums emit as DOUBLES OF SCALE-2-ROUNDED EXACT DECIMAL SUMS:
      // the decimal sum is exact at scale 6, ROUND(·,2) is deterministic
      // half-away-from-zero in both engines (values positive), and the
      // resulting scale-2 unscaled value stays < 2^53 at every swept
      // corpus size, so the final decimal->double cast is a single
      // correctly-rounded IEEE op in both engines (FLOATS.md M3a cliff
      // avoided by construction, not by envelope). This keeps the
      // emission inside the driver-proven {double,int64,string,date,
      // timestamp} hash surface — the round-13 DECIMAL(38,6) emission
      // was bit-right but outside the driver's proven input space.
      // NOTE: a bare decimal downcast does NOT replace ROUND — DuckDB's
      // CAST(d AS DECIMAL(38,2)) truncates where ROUND rounds (measured).
      def dsumR2(c: org.apache.spark.sql.Column) =
        round(sum(c.cast("decimal(18,6)")), 2).cast("double")
      li.groupBy("l_returnflag", "l_linestatus").agg(
          dsumR2(dec(col("l_quantity"))).as("sum_qty"),
          dsumR2(dec(col("l_extendedprice"))).as("sum_base_price"),
          dsumR2(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsumR2(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount"))
            * rate(lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        // The avgs divide the EMITTED double sums (bit-identical across
        // engines per the above) by the exact integer count: one IEEE
        // division in both engines — no separate decimal->double cast
        // left anywhere in this query (closes the ADVICE r13 envelope
        // gap on avg_price, whose scale-6 cast input crossed 2^53 at x20).
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

    // TPC-H Q2 shape: correlated scalar MIN over a join ("the supplier
    // offering this part's minimum price"), DECORRELATED the scalable
    // way: per-(part, supplier) floor price as one fact aggregation, the
    // per-part minimum as a second census-level aggregate, winners via an
    // equi-join back on (part, price). The region/nation/size dims all
    // broadcast into the fact scan first, so the only fact-sized shuffle
    // is the (part, supplier) groupBy. Prices are stored doubles picked
    // by MIN — no arithmetic, so the equality join decides identically in
    // both engines. (The fixture has no partsupp table; lineitem plays
    // the supply-offer role.)
    "olap_min_price_supplier" -> ((s, d) => {
      val esupp = graft.Tables(s, d, "supplier")
        .join(broadcast(graft.Tables(s, d, "nation")
          .join(broadcast(graft.Tables(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val sized = graft.Tables(s, d, "part")
        .filter(col("p_size") === 15).select("p_partkey", "p_type")
      val cand = graft.Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(esupp.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sized.select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice")).as("supp_price"))
      val best = cand.groupBy("l_partkey")
        .agg(min(col("supp_price")).as("min_price"))
      cand.join(best, "l_partkey")
        .filter(col("supp_price") === col("min_price"))
        .join(broadcast(esupp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("p_type"), col("min_price"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
    }),

    // TPC-H Q13 shape: customer order-count distribution INCLUDING the
    // zero-order customers — the left-outer histogram an inner join
    // silently drops rows from. Scalable order: aggregate orders down to
    // the customer census FIRST, left-join customer onto that census
    // (never the reverse — the fact never carries customer attributes),
    // coalesce the no-match count to 0, then the tiny second histogram
    // groupBy. All-integer.
    "olap_cust_order_dist" -> ((s, d) => {
      val oc = graft.Tables(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      graft.Tables(s, d, "customer").select("c_custkey")
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q21 shape: the multi-way semi+anti SELF-join — suppliers
    // whose late shipment was the ONLY late one in a multi-supplier
    // finished order ("kept the order waiting"). late = shipped > 90
    // days after order date (the fixture has no commit/receipt dates).
    // Both the EXISTS (some other supplier in the order) and NOT EXISTS
    // (no other LATE supplier) are native left_semi/left_anti joins
    // shuffling on the order key only, with the ≠-supplier predicate as
    // a post-shuffle filter — never a fact×fact product; the distinct
    // (order, supplier) projections shrink both sides before any join.
    "olap_late_suppliers" -> ((s, d) => {
      // NOTE (optimization round 20, measured): materializing `late` once
      // via eager localCheckpoint was tried and REVERTED — 1.49 s -> 1.99 s
      // at sf0.1 local[8]. Although `late` feeds both the EXISTS probe and
      // the NOT-EXISTS build, physical-plan exchange reuse (ReuseExchange,
      // visible in the executed plan) already shares the expensive
      // lineitem⋈orders + distinct exchanges between the two branches, so
      // the checkpoint only added a write+read round trip.
      val late = graft.Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(graft.Tables(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate").cast("date") >
          date_add(col("o_orderdate").cast("date"), 90))
        .select("l_orderkey", "l_suppkey").distinct()
      val others = graft.Tables(s, d, "lineitem")
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        .distinct()
      val lateOthers = late
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      late
        .join(others, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .join(broadcast(graft.Tables(s, d, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // TPC-H Q7 shape: bilateral trade volume — revenue flowing between
    // two specific nations in either direction, by ship year. The deep
    // join tree keeps the two fact-sized joins (lineitem→orders→customer)
    // on the shuffle path and broadcasts supplier + both nation resolves;
    // the nation-pair disjunction evaluates AFTER the cheap broadcast
    // joins, on two tiny string columns.
    "olap_nation_volume" -> ((s, d) => {
      val nat = graft.Tables(s, d, "nation").select("n_nationkey", "n_name")
      val li = graft.Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
          "l_discount")
      li.join(graft.Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
        .join(broadcast(graft.Tables(s, d, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate").cast("date")).cast("int").as("l_year"))
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 shape: market share — one nation's suppliers' slice of a
    // whole region's customer revenue, per order year. The conditional
    // numerator and the total are the SAME exact-decimal sum over one
    // pass (no second scan), so the share is a single IEEE division of
    // identically-derived doubles in both engines.
    "olap_market_share" -> ((s, d) => {
      val asiaNat = graft.Tables(s, d, "nation")
        .join(broadcast(graft.Tables(s, d, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val suppNat = graft.Tables(s, d, "supplier")
        .join(broadcast(graft.Tables(s, d, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name"))),
          col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), (col("n_name") === "NATION_3").as("is_target"))
      graft.Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(graft.Tables(s, d, "orders").select("o_orderkey", "o_custkey",
          "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
        .join(graft.Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNat), col("c_nationkey") === col("cnk"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate").cast("date")).cast("int").as("o_year"),
          (dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
            .as("rev"),
          col("is_target"))
        .groupBy("o_year")
        .agg(sum(when(col("is_target"), col("rev")).cast("decimal(18,6)"))
            .cast("double").as("target_rev"),
          sum(col("rev").cast("decimal(18,6)")).cast("double").as("total_rev"))
        .withColumn("mkt_share", col("target_rev") / col("total_rev"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape: product-line profit by supplier nation × year with
    // a LIKE filter on the part name. Profit = revenue − retail cost of
    // the shipped quantity (the fixture has no partsupp supplycost;
    // p_retailprice plays the unit-cost role). The LIKE-filtered part
    // dim broadcasts into the scan, so only matching lines ever leave
    // it; both product terms are exact decimal money math.
    "olap_product_profit" -> ((s, d) => {
      val redParts = graft.Tables(s, d, "part")
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      graft.Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(graft.Tables(s, d, "supplier")
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(graft.Tables(s, d, "nation")
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate").cast("date")).cast("int").as("o_year"))
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount"))
            - dec(col("p_retailprice")) * dec(col("l_quantity")))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q10 shape: returned-item top customers — who to call about a
    // quarter's returns. Scalable order: the fact side aggregates down
    // to a customer-revenue census FIRST and only then joins customer
    // attributes (census-sized join), never dragging name/acctbal
    // through the fact shuffle; top 20 is a TakeOrdered, not a sort.
    "olap_returned_customers" -> ((s, d) => {
      val rev = graft.Tables(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(graft.Tables(s, d, "orders")
          .filter(col("o_orderdate").cast("date") >= lit("1996-01-01") &&
            col("o_orderdate").cast("date") < lit("1996-04-01"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("revenue"))
      rev.join(graft.Tables(s, d, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("c_nationkey"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q19 shape: disjunctive multi-table predicate — an OR of
    // brand × size × quantity conjunctions spanning both join sides.
    // Catalyst can't push a cross-table OR whole, but it CAN push the
    // union of each branch's single-table conjuncts (derived filter on
    // part: the three brands; on lineitem: the quantity hull), so the
    // broadcast join sees pre-pruned inputs and the full disjunction
    // evaluates post-join as one codegen'd predicate.
    "olap_disjunctive_revenue" -> ((s, d) => {
      val part = graft.Tables(s, d, "part").select("p_partkey", "p_brand", "p_size")
      graft.Tables(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q20 shape: the nested semi-join chain — suppliers who
    // dominate a part's annual volume (>40% of its total shipped
    // quantity; the fixture-schema analog of Q20's excess-stock
    // availability test). Two stacked census aggregations (part×supplier
    // then part) joined back — the same decorrelation as Q17/Q2 — then
    // one census-level count per supplier; the supplier dim broadcasts
    // at the end. The 0.4×total threshold is one IEEE multiply of a
    // decimal-exact double, identical in both engines.
    "olap_dominant_supplier" -> ((s, d) => {
      val pq = graft.Tables(s, d, "lineitem")
        .filter(year(col("l_shipdate").cast("date")) === 1996)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(dec(col("l_quantity"))).as("sq"))
      val pt = pq.groupBy("l_partkey").agg(sum(col("sq").cast("decimal(18,6)"))
        .cast("double").as("tq"))
      pq.join(pt, "l_partkey")
        .filter(col("sq") > lit(0.4) * col("tq"))
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_dominated"))
        .join(broadcast(graft.Tables(s, d, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_dominated"))
        // s_name is NOT a supplier identity at scale (replicated fixtures
        // share names across shifted keys): group stays per-suppkey, and
        // n_dominated joins the sort so name ties order deterministically
        .orderBy("s_name", "n_dominated")
    }),

    // TPC-H Q15 shape: agg-view max selection — quarter revenue per
    // supplier (the "view"), then the supplier(s) achieving the maximum.
    // Decorrelated: the revenue census aggregates once, the 1-row max
    // broadcasts back over it, and the winner filter is an equality of
    // doubles both derived from the SAME exact-decimal sum — no
    // recomputation, no correlated rescan. Supplier resolves broadcast.
    "olap_top_supplier" -> ((s, d) => {
      val rev = graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
          col("l_shipdate").cast("date") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("total_rev"))
      rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("mx"))))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(graft.Tables(s, d, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q11 shape: important-stock identification — group values
    // kept only if they exceed a threshold derived from a GLOBAL scalar
    // subquery (here 1.2× the average per-part line value; avg-relative
    // so the kept fraction is scale-stable, unlike Q11's SF-scaled
    // fraction-of-total). Decorrelated the standard way: the per-part
    // census aggregates once, the 1-row threshold broadcasts back as a
    // crossJoin, and the HAVING is a plain filter over the census.
    // Determinism: part_value is a scale-6-decimal sum cast to double
    // (≤6 fractional digits, exact round trip), so re-summing those
    // doubles as DECIMAL(18,6) for the average is exact, and the
    // threshold compare multiplies identical doubles in both engines.
    "olap_important_parts" -> ((s, d) => {
      val pv = graft.Tables(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(dsum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("part_value"))
      pv.crossJoin(broadcast(pv.agg(
          (sum(col("part_value").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("avg_value"))))
        .filter(col("part_value") > lit(1.2) * col("avg_value"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // TPC-H Q12 shape: shipping-category service-level report — the
    // fact⋈orders join where the MEASURE is a conditional count on an
    // ORDERS attribute (priority) but the GROUP key is a LINEITEM
    // attribute (returnflag playing shipmode; the fixture carries no
    // l_shipmode). The ship-year filter prunes lineitem at its scan;
    // orders projects only (key, priority) into the join; counts are
    // conditional sums in one pass.
    "olap_priority_shipmode" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      graft.Tables(s, d, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
          col("l_shipdate").cast("date") < lit("1997-01-01"))
        .select("l_orderkey", "l_returnflag")
        .join(graft.Tables(s, d, "orders")
          .select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q16 shape: supplier diversity per part category with an
    // excluded-supplier anti-set — count(DISTINCT supplier) by
    // (brand, type, size) over the part⋈supply relationship, minus
    // suppliers on a denylist (negative account balance standing in for
    // Q16's complaints predicate). The fact collapses to its DISTINCT
    // (part, supplier) pair census FIRST (one shuffle, fact never
    // reaches the join wide), the filtered part dim and the tiny
    // denylist both broadcast, and the grouped distinct count runs on
    // the pruned pair census only.
    "olap_parts_supplier_count" -> ((s, d) => {
      val badSupp = graft.Tables(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val cats = graft.Tables(s, d, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      graft.Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(cats), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Wide→long melt (UNPIVOT): the missing inverse of agg_reason_pivot —
    // every BI export that feeds a long-format metrics store reverses its
    // report pivot this way. Dataset.unpivot is the native relational op:
    // it plans as a per-row Expand inside whole-stage codegen — NO
    // shuffle beyond the grouped rollup that builds the wide input, and
    // output size is rows × measures regardless of fact size, so the
    // shape is scale-free. The measure sums are the repo's order-free
    // DECIMAL pattern, melted AFTER the final double cast so all three
    // value columns share one type.
    "agg_unpivot_measures" -> ((s, d) => {
      val wide = graft.Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(dec(col("l_quantity"))).as("sum_qty"),
          dsum(dec(col("l_extendedprice"))).as("sum_price"),
          dsum(dec(col("l_discount"))).as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag"), col("l_linestatus")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "l_linestatus", "measure")
    }),

    // Ratio-to-report window: each nation's share of its region's order
    // book + rank within region — the window class (share of partition
    // total) the win_* family was missing. The window runs over the
    // NATION census (25 rows at any SF — the fact collapses in the
    // groupBy first), dims broadcast into the fact scan, and the share
    // is one IEEE division of decimal-exact doubles.
    "win_share_of_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nat = graft.Tables(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val reg = graft.Tables(s, d, "region").select("r_regionkey", "r_name")
      val cust = graft.Tables(s, d, "customer").select("c_custkey", "c_nationkey")
      val natRev = graft.Tables(s, d, "orders")
        .select("o_custkey", "o_totalprice")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("o_totalprice")).as("revenue"))
      natRev
        .withColumn("region_total",
          sum(col("revenue").cast("decimal(18,6)"))
            .over(Window.partitionBy("r_name")).cast("double"))
        .withColumn("share", col("revenue") / col("region_total"))
        .withColumn("rnk", rank().over(
          Window.partitionBy("r_name").orderBy(col("revenue").desc, col("n_name"))))
        .select("r_name", "n_name", "revenue", "region_total", "share", "rnk")
        .orderBy("r_name", "n_name")
    }),
  )

  private lazy val giniQueries: Map[String, QFn] = Map(
    // Decile table for the same concentration story Gini compresses to
    // one number: customers ranked by revenue, cut into tenths, each
    // tenth's share of the book. The rank is ops/GlobalRowNumber (range-
    // repartitioned two-pass — ONE shuffle, no single-task sort), and the
    // decile is SQL ntile semantics derived arithmetically from (rank, n):
    // with base = ⌊n/10⌋ and r = n mod 10, the first r buckets hold
    // base+1 rows and the rest hold base — exactly what DuckDB's
    // ntile(10) assigns over the same total order, so the oracle keeps
    // the natural window function while the engine side scales past one
    // task. Share is one division of identical decimal-exact doubles.
    "agg_decile_share" -> ((s, d) => {
      val rev = graft.Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      val ranked = graft.ops.GlobalRowNumber.withRowNumberExpr(
        rev, "i", Seq(col("rev").desc, col("o_custkey")))
      // census stats come from the already-checkpointed ranked frame —
      // no second scan of orders
      val stats = ranked.agg(count(lit(1)).as("n"),
        sum(col("rev")).cast("double").as("total"))
      ranked.crossJoin(broadcast(stats))
        .withColumn("decile",
          graft.ops.GlobalRowNumber.ntileFromRank(col("i"), col("n"), 10))
        .groupBy("decile")
        .agg(count(lit(1)).as("customers"),
          sum(col("rev")).cast("double").as("revenue"),
          first(col("total")).as("total"))
        .select(col("decile"), col("customers"), col("revenue"),
          (col("revenue") / col("total")).as("share"))
        .orderBy("decile")
    }),

    // Revenue-concentration report: the Gini coefficient over per-customer
    // revenue — the "do 1% of customers carry the book?" audit, the same
    // inequality lens a training-mix review applies to source weights.
    // The global rank is ops/GlobalRowNumber (range-repartition + per-
    // partition offsets), so even a customer census that outgrows one
    // task ranks in parallel — no partition-less Window anywhere in the
    // plan. Σ i·rev stays in DECIMAL(38,2) (revenue has 2 decimals, so
    // the product is exact and the total's backing integer stays far
    // under 2^53 — see the dsum note above).
    "agg_gini_revenue" -> ((s, d) => {
      val rev = graft.Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("rev"))
      val ranked = graft.ops.GlobalRowNumber.withRowNumberExpr(
        rev, "i", Seq(col("rev"), col("o_custkey")))
      // total_revenue emits as the double of the SCALE-2-ROUNDED exact
      // decimal sum: rev carries 2 real decimal digits so ROUND(·,2) is
      // the identity, and the scale-2 unscaled value stays < 2^53 at
      // every swept corpus size -> the decimal->double cast is a single
      // correctly-rounded IEEE op in both engines (M3a-safe by
      // construction, inside the driver-proven double emission surface —
      // the r13 DECIMAL(38,6) emission failed the driver hash).
      // The gini closed form consumes that SAME emitted double (bit-
      // identical across engines), so only the s cast is still
      // M3a-eligible at x20 — its measured 8-ulp drift is absorbed by
      // the Class-C output snap (round 12), same as the OLS moments.
      ranked.agg(
          count(lit(1)).as("n"),
          round(sum(col("rev")), 2).cast("double").as("total_d"),
          sum((col("i") * col("rev")).cast("decimal(38,2)")).cast("double").as("s"))
        .select(col("n").as("n_customers"),
          col("total_d").as("total_revenue"),
          round((lit(2.0) * col("s")) / (col("n") * col("total_d")) -
            (col("n") + lit(1.0)) / col("n"), 12).as("gini"))
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
        |    CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_d,
        |    CAST(SUM(CAST(i * rev AS DECIMAL(38,2))) AS DOUBLE) AS s
        |  FROM cr)
        |SELECT n AS n_customers, total_d AS total_revenue,
        |  round((2.0 * s) / (n * total_d)
        |        - (n + 1.0) / n, 12) AS gini
        |FROM ag""".stripMargin,

    // UNPIVOT is not universally portable SQL — the oracle spells the
    // same melt as the canonical UNION ALL so the semantics are pinned
    // engine-independently.
    "agg_unpivot_measures" ->
      """WITH uw AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, measure, value FROM (
        |  SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure,
        |         sum_qty AS value FROM uw
        |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM uw
        |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_disc', sum_disc FROM uw) u
        |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin,

    "win_share_of_total" ->
      """WITH snr AS (
        |  SELECT r_name, n_name,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, revenue,
        |  CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
        |       OVER (PARTITION BY r_name) AS DOUBLE) AS region_total,
        |  revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
        |       OVER (PARTITION BY r_name) AS DOUBLE) AS share,
        |  CAST(rank() OVER (PARTITION BY r_name
        |       ORDER BY revenue DESC, n_name) AS INT) AS rnk
        |FROM snr ORDER BY r_name, n_name""".stripMargin,

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
        |    CAST(ROUND(SUM(qty), 2) AS DOUBLE) AS sum_qty,
        |    CAST(ROUND(SUM(ext), 2) AS DOUBLE) AS sum_base_price,
        |    CAST(ROUND(SUM(CAST(ext * disc1 AS DECIMAL(18,6))), 2) AS DOUBLE)
        |      AS sum_disc_price,
        |    CAST(ROUND(SUM(CAST(ext * disc1 * tax1 AS DECIMAL(18,6))), 2) AS DOUBLE)
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
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE)
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

    "olap_min_price_supplier" ->
      """WITH esupp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), cand AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supp_price
        |  FROM lineitem
        |  JOIN esupp ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15
        |  GROUP BY 1, 2
        |), best AS (
        |  SELECT l_partkey, min(supp_price) AS min_price FROM cand GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_type,
        |  min_price
        |FROM cand JOIN best USING (l_partkey)
        |JOIN esupp ON cand.l_suppkey = esupp.s_suppkey
        |JOIN part ON cand.l_partkey = part.p_partkey
        |WHERE supp_price = min_price
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,

    "olap_cust_order_dist" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "olap_late_suppliers" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY l1.l_suppkey, s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "olap_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "olap_market_share" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
        |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |         * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |         AS DECIMAL(18,6)) END) AS DOUBLE) AS target_rev,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |         * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |         AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |         * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |         AS DECIMAL(18,6)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |         * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |         AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "olap_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS o_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |         - CAST(p_retailprice AS DECIMAL(18,6))
        |           * CAST(l_quantity AS DECIMAL(18,6))
        |         AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "olap_returned_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |             * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, revenue, c_acctbal, c_nationkey
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "olap_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |           AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    "olap_dominant_supplier" ->
      """WITH pq AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq
        |  FROM lineitem
        |  WHERE year(CAST(l_shipdate AS DATE)) = 1996
        |  GROUP BY 1, 2
        |), pt AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(sq AS DECIMAL(18,6))) AS DOUBLE) AS tq
        |  FROM pq GROUP BY 1)
        |SELECT s_name, count(*) AS n_dominated
        |FROM pq JOIN pt USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE sq > 0.4 * tq
        |GROUP BY l_suppkey, s_name
        |ORDER BY s_name, n_dominated""".stripMargin,

    "olap_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |             * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |             AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "olap_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |             * CAST(1.0 - l_discount AS DECIMAL(8,6))
        |             AS DECIMAL(18,6))) AS DOUBLE) AS part_value
        |  FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*) AS avg_value FROM pv)
        |SELECT l_partkey, part_value FROM pv, t
        |WHERE part_value > 1.2 * avg_value
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "olap_priority_shipmode" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "olap_parts_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
  )
}

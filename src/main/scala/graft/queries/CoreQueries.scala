package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{CompositeJoin, FieldSelection, SecondarySort, TotalOrderSort}

/** Relational parity queries: aggregation, joins (inner/outer/override/
  * semi/anti/broadcast), set ops, total-order sort, top-k, secondary sort,
  * field selection. Each has a DuckDB oracle in [[oracleSql]].
  *
  * Numeric discipline for oracle parity: money is cast to DECIMAL per row
  * before aggregation (exact, order-independent — float summation order
  * would differ between engines), counts/sums are cast to explicit types
  * on BOTH sides (DuckDB widens SUM(BIGINT) to HUGEINT and decimals
  * differently than Spark).
  */
object CoreQueries extends QueryModule {

  /** Fixed-point money: cents (or 1e-4 units for price*discount) as
    * BIGINT. The decimal cast makes the per-row conversion exact, and the
    * whole aggregation path stays in codegen'd longs — a BigDecimal-backed
    * DECIMAL(38,_) sum measured ~3.7x slower at sf0.1. int64 headroom is
    * ~9e16 cents per group; past that, switch the SUM to DECIMAL(38,0).
    */
  private def cents(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IntSumReducer/LongSumReducer + combiner (mapreduce/lib/reduce/
    // IntSumReducer.java:30; combiner = Job.setCombinerClass:870).
    // Spark's HashAggregate partial/final IS the combiner pattern.
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("sum_disc_price_e4"),
          count(lit(1)).as("count_order"))
    }),

    // Multi-way shuffle join + aggregation (the datajoin pattern at scale:
    // hadoop-datajoin/.../DataJoinReducerBase.java:129-214). nation/region
    // are broadcast — no shuffle for the small dims.
    "q5_join_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("revenue_e4"),
          count(lit(1)).as("n_rows"))
    }),

    // CDC MERGE-INTO apply (see operators/Cdc): a deterministic
    // changeset — upserts on one key stride, deletes on another,
    // inserts under fresh negative keys — folded to latest-per-key by
    // map-side-combinable max_by, then one full-outer join resolves
    // against the base. The oracle states the POST-state directly
    // (survivors with overrides + inserted rows), an independent
    // formulation agreeing row-for-row.
    "cdc_apply" -> ((s, dir) => {
      import graft.operators.Cdc
      val o = Tables(s, dir, "orders")
      val k = col("o_orderkey")
      val upd = o.filter(k % 7 === 0 && k % 11 =!= 0)
        .withColumn("o_orderpriority", lit("0-UPDATED"))
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      val del = o.filter(k % 11 === 0)
        .withColumn("__op", lit("D")).withColumn("__seq", lit(1L))
      val ins = o.filter(k % 13 === 0)
        .withColumn("o_orderkey", -col("o_orderkey") - 1)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("__op", lit("I")).withColumn("__seq", lit(1L))
      Cdc.applyChanges(o, upd.unionByName(del).unionByName(ins),
          "o_orderkey", "__seq", "__op")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("price_c"), col("o_orderpriority"))
    }),

    // SCD Type 2 history (see Cdc.history): layered changes — an
    // update stride, a second update on half of it (3-version
    // histories), and a delete stride — expanded to every version with
    // its validity interval; the live slice of this output equals
    // cdc_apply's post-state (law-checked). Oracle replays the same
    // lead-window interval construction.
    "cdc_history" -> ((s, dir) => {
      import graft.operators.Cdc
      val o = Tables(s, dir, "orders")
      val k = col("o_orderkey")
      val ch1 = o.filter(k % 7 === 0)
        .withColumn("o_orderpriority", lit("0-UPD-A"))
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      val ch2 = o.filter(k % 14 === 0)
        .withColumn("o_orderpriority", lit("0-UPD-B"))
        .withColumn("__op", lit("U")).withColumn("__seq", lit(2L))
      val ch3 = o.filter(k % 11 === 0)
        .withColumn("__op", lit("D")).withColumn("__seq", lit(3L))
      Cdc.history(o, ch1.unionByName(ch2).unionByName(ch3),
          "o_orderkey", "__seq", "__op")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("valid_from"), col("valid_to"), col("is_current"))
    }),

    // Data-quality audit (the dbt-test/Deequ capability, see
    // operators/Checks): null/unique/range rules fuse into one scan
    // per table; FK rules are anti-joins against the (broadcastable)
    // dimension keys. The fixture is TPC-H-clean so every count is 0 —
    // the oracle replays the counting; DETECTION is spec'd separately
    // with injected violations (OperatorSpec).
    "dq_report" -> ((s, dir) => {
      import graft.operators.Checks._
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val c = Tables(s, dir, "customer")
      report(o, Seq(
        NotNull("o_custkey"), Unique(Seq("o_orderkey")),
        RefIntegrity("o_custkey", c, "c_custkey")))
        .unionByName(report(li, Seq(
          Unique(Seq("l_orderkey", "l_linenumber")),
          InRange("l_quantity", 1, 50), InRange("l_discount", 0, 1),
          RefIntegrity("l_orderkey", o, "o_orderkey"))))
    }),

    // Shipping-priority top-k (TPC-H Q3 shape): segment + date filters
    // push to both scans, the order/lineitem join shuffles only
    // survivors, and the top 10 rides TakeOrderedAndProject (per-
    // partition heads + one driver merge — never a global sort).
    // Deterministic under ties via the unique orderkey.
    "q3_shipping" -> ((s, dir) => {
      val cut = to_timestamp(lit("1998-06-01"))
      val c = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").filter(col("o_orderdate") < cut)
      val li = Tables(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Forecasting-revenue filter agg (TPC-H Q6 shape): every predicate
    // reaches the parquet scan, no join, one partial+final aggregate —
    // the canonical pushdown probe. Exact cents: the discount band is
    // an integer-cent comparison, never a float epsilon.
    "q6_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val disc = cents(col("l_discount"))
      li.filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          disc.between(5L, 7L) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * disc).as("revenue_e4"),
          count(lit(1)).as("n_rows"))
    }),

    // Returned-item reporting (TPC-H Q10 shape): one order-date quarter
    // + returnflag filter, nation broadcast, top 20 customers by lost
    // revenue with the unique custkey as tie-break.
    "q10_returns" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-04-01")))
      val li = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          cents(col("c_acctbal")).as("acctbal_c"), col("n_name"))
        .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Large-volume-customer (TPC-H Q18 shape): the group-then-semi-join
    // plan — ONE groupBy on l_orderkey finds the >200-quantity orders
    // (a tiny survivor set), which broadcasts back against orders and
    // customer; lineitem is scanned once and never re-joined at width.
    // Quantities are integral in the fixture, so the sum is an exact
    // BIGINT. Top 100 by total quantity, orderkey tie-break.
    "q18_large" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 200L)
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          cents(col("o_totalprice")).as("totalprice_c"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Promotion-revenue share (TPC-H Q14 shape): one shipdate-month
    // scan of lineitem joined to part on partkey; the promo flag rides
    // the join as a conditional partial aggregate, so the answer is two
    // exact integer sums (numerator/denominator), never a float ratio.
    // The join stays declarative — AQE broadcasts part when it fits.
    "q14_promo" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      val p = Tables(s, dir, "part")
      val rev = cents(col("l_extendedprice")) *
        (lit(100L) - cents(col("l_discount")))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
            .as("promo_revenue_e4"),
          sum(rev).as("total_revenue_e4"))
    }),

    // Two-nation volume shipping (TPC-H Q7 shape): lineitem resolves
    // its supplier nation and (through orders) its customer nation,
    // keeping only the two trading partners in either direction. Both
    // nation joins broadcast (25 rows — a dimension stays broadcast at
    // any sf); the nation-pair filter applies right after each
    // broadcast so the big orders join carries only survivors. Yearly
    // revenue as exact integer e4 cents.
    "q7_volume" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val nat = Tables(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      val sup = Tables(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = Tables(s, dir, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables(s, dir, "lineitem")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(cents(col("l_extendedprice")) *
          (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
    }),

    // CompositeInputFormat `inner(...)` (mapreduce/lib/join/
    // InnerJoinRecordReader.java:54): key in every source.
    "join_inner" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
        .withColumnRenamed("n_nationkey", "nationkey")
        .withColumnRenamed("n_regionkey", "regionkey")
      val r = Tables(s, dir, "region").withColumnRenamed("r_regionkey", "regionkey")
      val sup = Tables(s, dir, "supplier").withColumnRenamed("s_nationkey", "nationkey")
      CompositeJoin.inner("nationkey", Seq(CompositeJoin.inner("regionkey", Seq(n, r)), sup))
        .select("s_suppkey", "s_name", "n_name", "r_name")
    }),

    // CompositeInputFormat `outer(...)` (OuterJoinRecordReader.java:49):
    // key in any source, unwritten TupleWritable slots -> NULL columns.
    "join_outer" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          count(lit(1)).as("order_cnt"),
          sum(cents(col("o_totalprice"))).as("spend_c"))
      CompositeJoin.outer("custkey", Seq(c, o))
    }),

    // CompositeInputFormat `override(...)` (OverrideRecordReader.java:1-117):
    // per key, value from the RIGHTMOST source holding it.
    "join_override" -> ((s, dir) => {
      def agg(df: DataFrame, key: String, bal: String) =
        df.groupBy(col(key).as("nationkey"))
          .agg(
            sum(cents(col(bal))).as("acctbal_c"),
            count(lit(1)).as("cnt"))
      val sup = agg(Tables(s, dir, "supplier"), "s_nationkey", "s_acctbal")
      val cust = agg(Tables(s, dir, "customer"), "c_nationkey", "c_acctbal")
      CompositeJoin.overrideJoin("nationkey", Seq("acctbal_c", "cnt"), Seq(sup, cust))
    }),

    // Semi/anti joins: absent from the reference as named ops (SURVEY
    // §2.4 note) — part of this engine's surface via Catalyst.
    "join_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),
    "join_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      // filter the probe side so the anti join is non-vacuous at every sf
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // DistributedCache broadcast-join pattern (mapreduce/Job.java:1074-1085,
    // filecache/DistributedCache.java:86-88): small side shipped to every
    // task == Spark broadcast hash join, asserted via explicit hint.
    "broadcast_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      val dim = broadcast(n.join(r, col("n_regionkey") === col("r_regionkey")))
      c.join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_c"))
    }),

    // §2.7 set operations (union via MultipleInputs; intersect/except are
    // capability gaps in the reference — Spark built-ins).
    "set_union" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    }),
    "set_intersect" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    }),
    "set_except" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    }),

    // Grouping sets — absent from the reference (SURVEY §2.5 note: filled
    // there by multi-job pipelines); first-class here via Catalyst.
    "rollup_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity"))).as("qty_c"), count(lit(1)).as("n"))
    }),
    "cube_agg" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(sum(cents(col("o_totalprice"))).as("total_c"), count(lit(1)).as("n"))
    }),

    // distinct == identity-reducer dedup (mapred/lib/IdentityReducer.java).
    "distinct_rows" -> ((s, dir) => {
      Tables(s, dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()
    }),

    // Sort example: RandomSampler -> TotalOrderPartitioner -> identity M/R
    // (examples/Sort.java:92-166). repartitionByRange samples internally;
    // rank assigned per-partition via zipWithIndex, no global bottleneck.
    "total_sort" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_totalprice")
      TotalOrderSort.withRank(o, 32, "rnk", col("o_totalprice"), col("o_orderkey"))
    }),

    // Grep job 2's ordering stage, with the limit the reference lacks
    // (examples/Grep.java:79-92 uses 1 reducer + decreasing comparator).
    "topk" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(cents(col("l_quantity"))).as("qty_c"))
        .orderBy(col("qty_c").desc, col("l_partkey").asc)
        .limit(20)
    }),

    // SecondarySort (examples/SecondarySort.java:51-239): group by key
    // prefix, order by secondary key within group.
    "secondary_sort" -> ((s, dir) => {
      SecondarySort.withSequence(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate"),
        "seq",
        part = Seq(col("l_orderkey")),
        order = Seq(col("l_shipdate"), col("l_linenumber")))
        .select("l_orderkey", "l_linenumber", "seq")
    }),

    // InverseMapper (mapreduce/lib/map/InverseMapper.java:30): (k,v)->(v,k).
    "inverse_map" -> ((s, dir) => {
      Tables(s, dir, "nation").select(col("n_name").as("k"), col("n_nationkey").as("v"))
    }),

    // FieldSelectionHelper spec "2,0:4-" over '|'-joined lines
    // (mapreduce/lib/fieldsel/FieldSelectionHelper.java:25-60).
    "fieldsel" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val line = concat_ws("|",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        col("l_returnflag"),
        col("l_linestatus"),
        col("l_partkey").cast("string"),
        col("l_suppkey").cast("string"),
        col("l_shipdate").cast("date").cast("string"))
      FieldSelection(li, line, "2,0:4-", "|")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "cdc_history" ->
      """WITH all_v AS (
        |  SELECT o_orderkey, o_orderpriority, 'U' AS op, 0 AS seq FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, '0-UPD-A', 'U', 1 FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, '0-UPD-B', 'U', 2 FROM orders WHERE o_orderkey % 14 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority, 'D', 3 FROM orders WHERE o_orderkey % 11 = 0
        |), iv AS (
        |  SELECT o_orderkey, o_orderpriority, op, seq,
        |         lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to
        |  FROM all_v
        |)
        |SELECT o_orderkey, o_orderpriority,
        |       CAST(seq AS BIGINT) AS valid_from,
        |       CAST(valid_to AS BIGINT) AS valid_to,
        |       CAST(valid_to IS NULL AS BIGINT) AS is_current
        |FROM iv WHERE op <> 'D'""".stripMargin,
    "cdc_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
        |       CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        |            THEN '0-UPDATED' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 11 <> 0
        |UNION ALL
        |SELECT -o_orderkey - 1, o_custkey, 'N',
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
        |       o_orderpriority
        |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin,
    "dq_report" ->
      """SELECT 'not_null:o_custkey' AS "check",
        |       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        |FROM orders
        |UNION ALL
        |SELECT 'unique:o_orderkey', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
        |FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'ref_integrity:o_custkey', CAST(COUNT(*) AS BIGINT)
        |FROM orders o
        |WHERE o_custkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'unique:l_orderkey+l_linenumber', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
        |FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'in_range:l_quantity',
        |       CAST(SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range:l_discount',
        |       CAST(SUM(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'ref_integrity:l_orderkey', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem l
        |WHERE l_orderkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin,
    "q5_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       o_orderpriority,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q6_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_c,
        |       n_name,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, acctbal_c, n_name
        |ORDER BY revenue_e4 DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "q18_large" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
        |)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_c,
        |       total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q14_promo" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS promo_revenue_e4,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS total_revenue_e4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "join_inner" ->
      """SELECT s_suppkey, s_name, n_name, r_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "join_outer" ->
      """WITH c AS (
        |  SELECT c_custkey AS custkey, c_name FROM customer WHERE c_custkey % 3 <> 0
        |), o AS (
        |  SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS order_cnt,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS spend_c
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT COALESCE(c.custkey, o.custkey) AS custkey, c_name, order_cnt, spend_c
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey""".stripMargin,
    "join_override" ->
      """WITH s AS (
        |  SELECT s_nationkey AS nationkey,
        |         CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_c,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM supplier GROUP BY s_nationkey
        |), c AS (
        |  SELECT c_nationkey AS nationkey,
        |         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_c,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY c_nationkey
        |)
        |SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
        |       COALESCE(c.acctbal_c, s.acctbal_c) AS acctbal_c,
        |       COALESCE(c.cnt, s.cnt) AS cnt
        |FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "broadcast_join" ->
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "set_union" ->
      "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
    "set_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    "set_except" ->
      "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier",
    "distinct_rows" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "total_sort" ->
      """SELECT o_orderkey, o_totalprice,
        |       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rnk
        |FROM orders""".stripMargin,
    "topk" ->
      """SELECT l_partkey, CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY qty_c DESC, l_partkey ASC LIMIT 20""".stripMargin,
    "secondary_sort" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS INTEGER) AS seq
        |FROM lineitem""".stripMargin,
    "inverse_map" ->
      "SELECT n_name AS k, n_nationkey AS v FROM nation",
    "fieldsel" ->
      """WITH t AS (
        |  SELECT concat_ws('|', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |                   l_returnflag, l_linestatus, CAST(l_partkey AS VARCHAR),
        |                   CAST(l_suppkey AS VARCHAR), CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS line
        |  FROM lineitem
        |), p AS (SELECT string_split(line, '|') AS f FROM t)
        |SELECT f[3] || '|' || f[1] AS sel_key,
        |       array_to_string(list_slice(f, 5, len(f)), '|') AS sel_value
        |FROM p""".stripMargin
  )
}

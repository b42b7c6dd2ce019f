package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Aggregators

/** Workloads over the `events` table: the reference's aggregate framework
  * (ValueAggregator descriptors), ValueHistogram report, plus the
  * incremental-processing shapes the reference lacks (tumbling windows,
  * sessionization) expressed as batch queries; the streaming variants
  * live in graft.streaming.
  */
object EventQueries extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  // fixed-point cents: exact and long-summed (see CoreQueries.cents)
  private def cents(c: Column): Column = (dec2(c) * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The aggregate framework's descriptor-string surface
    // (mapreduce/lib/aggregate/: LongValueSum.java:33, LongValueMax/Min,
    // StringValueMax/Min, UniqValueCount, dispatched by type name via
    // ValueAggregatorBaseDescriptor.generateValueAggregator, plus
    // user-class loading): the whole descriptor set runs as one
    // codegen'd partial+final HashAggregate (the combiner pattern,
    // Task.java:1563). Decimal min/max demonstrate the UserDefined path.
    "agg_framework" -> ((s, dir) => {
      import graft.functions.ValueAggregators
      val df = ev(s, dir)
        .withColumn("one", lit(1L))
        .withColumn("val_c", cents(col("value")))
      ValueAggregators.aggregate(df, "event_type", Seq(
        "LongValueSum:one",
        "LongValueSum:val_c",
        "UserDefined,graft.functions.DecimalMinDescriptor:value",
        "UserDefined,graft.functions.DecimalMaxDescriptor:value",
        "UniqValueCount:user_id",
        "StringValueMin:props",
        "StringValueMax:props"))
        .select(
          col("event_type"),
          col("LongValueSum_one").as("n"),
          col("LongValueSum_val_c").as("val_sum_c"),
          col("DecimalMin_value").as("val_min"),
          col("DecimalMax_value").as("val_max"),
          col("UniqValueCount_user_id").as("uniq_users"),
          col("StringValueMin_props").as("props_min"),
          col("StringValueMax_props").as("props_max"))
    }),

    // UniqValueCount's cap (mapreduce/lib/aggregate/UniqValueCount.java:35-95):
    // report = min(#distinct, cap), O(cap) state per group — via the
    // custom Aggregator in graft.functions.Aggregators.
    "uniq_cap" -> ((s, dir) => {
      ev(s, dir).groupBy("event_type").agg(
        Aggregators.cappedDistinct(col("user_id"), 50).as("capped_users"))
    }),

    // The reference's ACTUAL UniqValueCount shape: arbitrary (string)
    // values capped — its TreeMap is keyed by val.toString()
    // (UniqValueCount.java:59). Reached through the descriptor registry
    // ("UniqValueCount:props:50"), which routes every column type
    // through the string lane.
    "uniq_cap_str" -> ((s, dir) => {
      import graft.functions.ValueAggregators
      ValueAggregators.aggregate(ev(s, dir), "event_type",
        Seq("UniqValueCount:props:50"))
        .select(col("event_type"),
          col("UniqValueCount_props_50").as("capped_props"))
    }),

    // The beyond-cap lane of UniqValueCount: per-type distinct users
    // via mergeable HLL sketches, built per (type, day) and UNIONED up
    // — the incremental-rollup shape (per-day sketches compose to
    // month/alltime without re-reading raw data). Estimates are
    // implementation-specific (DataSketches HLL), so the driver records
    // a rows-only check; merge-exactness and the error bound vs exact
    // distinct are spec'd (see operators/Sketches).
    // The recorded rows carry the two laws in-row (the
    // multimodal_entropy pattern, so the driver output witnesses them,
    // not only ScalaTest): merge_exact_ok = merge-of-per-day-sketches
    // estimate == single-pass sketch-of-union estimate (HLL merge
    // algebra, exact equality); within_error_ok = |est − exact| ≤
    // 3·RSE·exact with RSE = 1.04/√2^lgK (the published HLL bound;
    // 3σ ≈ 4.9% at lgK=12).
    "uniq_hll" -> ((s, dir) => {
      import graft.operators.Sketches
      val e = ev(s, dir)
      val perDay = Sketches.distinctSketch(
        e.withColumn("day", to_date(col("ts"))),
        col("user_id"), lgK = 12, "event_type", "day")
      val merged = Sketches.mergeEstimate(perDay, "event_type")
      val direct = Sketches.distinctEstimate(e, col("user_id"), lgK = 12,
        "event_type").withColumnRenamed("uniq_est", "direct_est")
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_uniq"))
      val bound = 3.0 * 1.04 / math.sqrt(math.pow(2, 12))
      merged.join(direct, Seq("event_type")).join(exact, Seq("event_type"))
        .select(col("event_type"), col("uniq_est"),
          (col("uniq_est") === col("direct_est")).as("merge_exact_ok"),
          (abs(col("uniq_est") - col("exact_uniq")) <=
            lit(bound) * col("exact_uniq")).as("within_error_ok"))
    }),

    // The ENGINE-PORTABLE HLL lane — uniq_hll's fully-oracle-checked
    // twin (Sketches' portable block; the kmeansCodebook move applied
    // to cardinality sketches). Same incremental rollup shape
    // (per-(type, day) sketches merged up + a direct single-pass
    // sketch), but registers come from the replayable md5 hash and the
    // estimator's core (s = Σ 2^(49−M_j), v = zero registers) is EXACT
    // integers — so s, v AND the estimate itself hash-match the DuckDB
    // replay; nothing here is rows-only. The merge law is BIT-exact
    // (element-wise register max — no sparse-mode promotion), so
    // merge_bitexact_ok compares the merged and direct (s, v) pairs
    // directly; within_error_ok keeps the 3σ published bound vs the
    // exact count, computed identically in the oracle.
    "uniq_hll_portable" -> ((s, dir) => {
      import graft.operators.Sketches
      val e = ev(s, dir)
      val perDay = Sketches.portableRegisters(
        e.withColumn("day", to_date(col("ts"))),
        col("user_id"), "event_type", "day")
      val m2 = Sketches.portableSv(
        Sketches.portableMergeRegisters(perDay, "event_type"), "event_type")
      val d2 = Sketches.portableSv(
          Sketches.portableRegisters(e, col("user_id"), "event_type"),
          "event_type")
        .withColumnRenamed("s", "s_direct").withColumnRenamed("v", "v_direct")
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_uniq"))
      val bound = 3.0 * 1.04 / math.sqrt(4096.0)
      m2.join(d2, Seq("event_type")).join(exact, Seq("event_type"))
        .withColumn("uniq_est",
          Sketches.portableEstimate(col("s"), col("v")))
        .select(col("event_type"), col("s"), col("v"), col("uniq_est"),
          (col("s") === col("s_direct") && col("v") === col("v_direct"))
            .as("merge_bitexact_ok"),
          (abs(col("uniq_est") - col("exact_uniq")) <=
            lit(bound) * col("exact_uniq")).as("within_error_ok"),
          col("exact_uniq"))
    }),

    // ValueHistogram report (mapreduce/lib/aggregate/ValueHistogram.java:38-120):
    // per key, stats over the per-value frequency table. Two-level hash
    // aggregation — both levels get map-side combine; doubles derived
    // from exact integer sums (same expression in the oracle).
    "value_histogram" -> ((s, dir) => {
      val counts = ev(s, dir)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
      counts
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("uniq_vals"),
          min(col("cnt")).as("min_cnt"),
          max(col("cnt")).as("max_cnt"),
          median(col("cnt")).as("median_cnt"),
          sum(col("cnt")).as("s"),
          sum(col("cnt") * col("cnt")).as("ss"))
        .select(
          col("event_type"), col("uniq_vals"), col("min_cnt"), col("max_cnt"), col("median_cnt"),
          (col("s") / col("uniq_vals")).as("mean_cnt"),
          sqrt((col("ss") - col("s") * col("s") / col("uniq_vals")) / col("uniq_vals"))
            .as("stddev_cnt"))
    }),

    // Tumbling 1h window aggregation — capability gap in the reference
    // (SURVEY §2.9: no windowing); batch form of the streaming op.
    "window_agg" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("val_sum_c"))
    }),

    // Sessionization: 30-minute inactivity gap splits a user's event
    // stream into sessions — lag + running sum over a per-user window
    // (one shuffle by user_id; scales as users, not events-per-window).
    "sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gapUs = 1800L * 1000000L
      ev(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
            .when(lag(col("us"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
    }),

    // As-of join (engine addition — no temporal join in the reference,
    // none native in Spark): each purchase matched to the user's latest
    // at-or-before view via the union-sort-carry plan (ONE shuffle on
    // user_id, no range explode). The oracle is DuckDB's NATIVE ASOF
    // LEFT JOIN — an independent implementation agreeing bit-for-bit.
    // Right rows collapse to one per (user, ts) (max event_id) so the
    // equal-timestamp tie rule is well-defined on both engines.
    "asof_join" -> ((s, dir) => {
      import graft.operators.AsofJoin
      val ev = this.ev(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .agg(max("event_id").as("view_id"))
      AsofJoin.asof(purchases, views, "user_id", "ts_us", "ts_us", "view_id")
    }),

    // Range join (engine addition): every event matched to its
    // containing session interval through the BINNED plan — intervals
    // explode to covered 1h bins, the join is an equi-join on
    // (user_id, bin) + exact containment filter. A naive BETWEEN join
    // would plan as BroadcastNestedLoop (asserted away in PlanSpec);
    // the oracle IS that naive inequality join, replayed in DuckDB.
    "range_join_sessions" -> ((s, dir) => {
      import graft.operators.RangeJoin
      val points = ev(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val sess = queries("sessionize")(s, dir)
        .select(col("user_id"), col("sess_id"), col("start_us"), col("end_us"))
      RangeJoin.pointInInterval(points, sess, "user_id",
        "us", "start_us", "end_us", binSize = 3600L * 1000000L)
        .select(col("event_id"), col("sess_id"))
    }),

    // Funnel correlation (view -> purchase within 1 hour, same user):
    // the BATCH execution of the streaming followWithin operator — the
    // watermark calls are no-ops on a batch frame, so the exact code
    // path the stream-stream interval join runs is what the oracle
    // checks here (the stream side is spec'd for state eviction).
    "funnel_within" -> ((s, dir) =>
      graft.streaming.StreamingOps.followWithin(ev(s, dir),
        firstType = "view", thenType = "purchase",
        within = "1 hour", watermark = "2 hours")),

    // Skew-safe join surfaced as a query: event_type is the textbook
    // hot key (60k rows over 5 values); the salted plan scatters each
    // hot key over `salt` buckets so no single task owns a key. Results
    // are identical to the plain join — which is exactly the oracle.
    "salted_join" -> ((s, dir) => {
      import graft.operators.Skew
      val events = ev(s, dir)
      val dim = events.groupBy("event_type").agg(count(lit(1)).as("type_n"))
      Skew.saltedJoin(events.select(col("event_id"), col("event_type")),
        dim, "event_type", salt = 8)
        .select(col("event_id"), col("event_type"), col("type_n"))
    }),

    // Cohort retention (the classic product-analytics matrix): users
    // cohorted by their first-activity week, counted in every later
    // week they return, keyed by period = whole weeks since cohort.
    // Scale shape: ONE shuffle by user_id does all the per-user work —
    // min(week) and the distinct-week set in the same aggregation
    // (a user's distinct weeks are timeline-bounded, so collect_set is
    // a bounded buffer, the codebook discipline) — then the matrix is
    // a count over (cohort, period), narrow rows. No window function:
    // `min(w) OVER (PARTITION BY user)` would re-shuffle full activity
    // rows; the agg form carries one row per user. Both week
    // truncations are Monday-aligned so the day gap is an exact
    // multiple of 7 and the period division is exact.
    "cohort_retention" -> ((s, dir) => {
      val wk = date_trunc("week", col("ts")).cast("date")
      ev(s, dir)
        .select(col("user_id"), wk.as("w"))
        .groupBy("user_id")
        .agg(min(col("w")).as("c"), collect_set(col("w")).as("weeks"))
        .select(col("c"), explode(col("weeks")).as("w"))
        .select(col("c"),
          (datediff(col("w"), col("c")) / 7).cast("long").as("period"))
        .groupBy(col("c"), col("period"))
        .agg(count(lit(1)).as("n_users"))
        .select(date_format(col("c"), "yyyy-MM-dd").as("cohort"),
          col("period"), col("n_users"))
    }),

    // Behavioral transition matrix (Markov-chain counts): consecutive
    // event-type pairs per user in time order — the "what follows a
    // view" funnel-diagnostic aggregate. One user-keyed window for the
    // lead, then a 5x5-bounded count matrix; the shuffle carries
    // (user, type, us) narrow rows only.
    "transition_counts" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
    }),

    // Robust outlier screen (median/MAD, the standard heavy-tail-safe
    // rule): flag events whose absolute deviation from their type's
    // median exceeds 3x the median absolute deviation. Both medians
    // are EXACT lower medians through the value-count percentile lane
    // (integer cents — no float quantile drift), each a group-count-
    // sized artifact broadcast back to the stream; the flagging itself
    // is row-local. Mean/stddev would let one whale move the fence;
    // median/MAD is what monitoring pipelines actually deploy.
    "outlier_events" -> ((s, dir) => {
      import graft.operators.Quantiles
      val e = ev(s, dir).select(col("event_id"), col("event_type"),
        cents(col("value")).as("c"))
      val med = Quantiles.exactPercentiles(e, "event_type", col("c"), Seq(50))
        .select(col("event_type"), col("val").as("med_c"))
      val withMed = e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev_c", abs(col("c") - col("med_c")))
      val mad = Quantiles.exactPercentiles(
        withMed.select(col("event_type"), col("dev_c")),
        "event_type", col("dev_c"), Seq(50))
        .select(col("event_type"), col("val").as("mad_c"))
      withMed.join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("dev_c"),
          (col("dev_c") > col("mad_c") * 3).cast("long").as("is_outlier"))
    }),

    // Bloom-prefiltered semi join: restrict the event stream to repeat
    // purchasers. The key set (an aggregation result) can't broadcast-
    // hash-join at corpus scale, but its Bloom filter can — the big
    // side drops non-members BEFORE its semi-join shuffle (plan-pinned:
    // the UDF filter sits under the exchange), and the closing exact
    // semi join erases the bloom's false positives, so the oracle is
    // the plain semi join.
    "bloom_semi_join" -> ((s, dir) => {
      import graft.operators.BloomJoin
      val e = ev(s, dir)
      val buyers = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("np"))
        .filter(col("np") >= 2).select("user_id")
      BloomJoin.bloomSemiJoin(e.select(col("event_id"), col("user_id")),
        buyers, "user_id", expectedKeys = 100000L)
    }),

    // Pivot (long -> wide): daily counts fanned across a FIXED
    // event-type column list. The fixed list is the 100 TB discipline:
    // `pivot(col)` without values runs a distinct scan to discover the
    // schema — a whole extra corpus pass — and makes the output schema
    // data-dependent; production pivots declare their columns.
    "pivot_events" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      ev(s, dir)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    }),

    // Trailing 7-day activity per user at every event (the rolling
    // retention/LTV feature): a RANGE window over event-time micros —
    // frame membership by time VALUE, not row count, so duplicate
    // timestamps are peers on both engines. One shuffle by user_id;
    // state per task is the 7-day frame, bounded by a user's weekly
    // event rate, never the corpus.
    "rolling_7d" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-7L * 86400L * 1000000L, 0L)
      ev(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("c")).over(w).as("sum_7d_c"))
    }),

    // Gap-fill + forward-fill (time-series resample): per event type,
    // one row for EVERY day of the corpus span — absent days count 0
    // and carry the last seen daily revenue forward. The day spine is
    // sequence() over driver-collected bounds (two values — the
    // bounded-artifact discipline, no generate-series shuffle),
    // crossed with the 5-row type dim; the fill is last(ignoreNulls)
    // over a per-type window ordered by day. Scale: spine rows =
    // days x types, dwarfed by the event table the daily agg scans.
    "gapfill_daily" -> ((s, dir) => {
      val e = ev(s, dir)
      val daily = e.groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      val b = e.agg(min(date_trunc("day", col("ts")).cast("date")),
        max(date_trunc("day", col("ts")).cast("date"))).head()
      val spine = daily.select(col("event_type")).distinct()
        .crossJoin(s.range(1).select(explode(sequence(
          lit(b.getDate(0)), lit(b.getDate(1)))).as("day")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(last(col("sum_c"), ignoreNulls = true).over(w), lit(0L))
            .as("ffill_sum_c"))
    }),

    // Z-order layout key (the Delta/Iceberg OPTIMIZE ZORDER kernel):
    // user_id and event time quantized onto 16-bit lanes against
    // driver-collected bounds (one min/max agg, four longs — the
    // bounded-artifact discipline), then Morton-interleaved row-locally
    // (shifts/ands/ors, whole-stage codegen; plan-pinned map-only).
    // `Layout.zorderBy` range-partitions on this key so parquet
    // min/max stats prune on BOTH dimensions; the key itself is what
    // the oracle replays bit-for-bit.
    "zorder_key" -> ((s, dir) => {
      import graft.operators.Layout
      val e = ev(s, dir)
      val us = unix_micros(col("ts"))
      val b = e.agg(min(col("user_id")), max(col("user_id")),
        min(us), max(us)).head()
      val (ulo, uhi, tlo, thi) =
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      e.select(col("event_id"),
        Layout.zvalue(Seq(
          Layout.quantizeLinear(col("user_id"), ulo, uhi),
          Layout.quantizeLinear(us, tlo, thi))).as("z"))
    }),

    // JSON field extraction from the props column (semi-structured scan).
    "json_extract" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      ev(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(
          sum(col("k")).as("k_sum"),
          count(when(col("k") > 50, 1)).as("k_hi"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // full replay of the portable HLL: registers (bucket = top 12 of
    // the 60-bit md5 hash, rho = 49 − length-of-binary of the low 48
    // bits — no float log), the EXACT integer estimator core
    // (Σ 2^(49−M_j) over present registers + 2^49 per empty bucket),
    // and the estimate (the alpha·m²·2⁴⁹ constant written in the same
    // left-associated op order as the Spark literals, one division,
    // ln only on the small-range path). merge_bitexact_ok is TRUE by
    // register-max algebra — the Spark side computes both paths
    // genuinely, so a broken merge shows as a flag mismatch here.
    "uniq_hll_portable" ->
      """WITH hh AS (
        |  SELECT event_type,
        |         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events
        |), br AS (
        |  SELECT event_type, h >> 48 AS b,
        |         CASE WHEN (h & 281474976710655) = 0 THEN 49
        |              ELSE 49 - length(ltrim(bin(h & 281474976710655), '0')) END AS rho
        |  FROM hh
        |), reg AS (
        |  SELECT event_type, b, MAX(rho) AS m FROM br GROUP BY event_type, b
        |), agg AS (
        |  SELECT event_type,
        |         CAST(SUM(1::BIGINT << (49 - m))
        |              + (4096 - COUNT(*)) * (1::BIGINT << 49) AS BIGINT) AS s,
        |         CAST(4096 - COUNT(*) AS BIGINT) AS v
        |  FROM reg GROUP BY event_type
        |), ex AS (
        |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uniq
        |  FROM events GROUP BY event_type
        |), est AS (
        |  SELECT a.event_type, a.s, a.v,
        |         CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 * 562949953421312.0)
        |                   / CAST(a.s AS DOUBLE) <= 10240.0 AND a.v > 0
        |              THEN 4096.0 * ln(4096.0 / CAST(a.v AS DOUBLE))
        |              ELSE (0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 * 562949953421312.0)
        |                   / CAST(a.s AS DOUBLE) END AS uniq_est
        |  FROM agg a
        |)
        |SELECT e.event_type, e.s, e.v, e.uniq_est,
        |       TRUE AS merge_bitexact_ok,
        |       (abs(e.uniq_est - x.exact_uniq) <= (3.0 * 1.04 / 64.0) * x.exact_uniq) AS within_error_ok,
        |       x.exact_uniq
        |FROM est e JOIN ex x USING (event_type)""".stripMargin,
    "agg_framework" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_sum_c,
        |  MIN(CAST(value AS DECIMAL(18,2))) AS val_min,
        |  MAX(CAST(value AS DECIMAL(18,2))) AS val_max,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users,
        |  MIN(props) AS props_min, MAX(props) AS props_max
        |FROM events GROUP BY event_type""".stripMargin,
    "uniq_cap" ->
      """SELECT event_type,
        |  CAST(LEAST(COUNT(DISTINCT user_id), 50) AS BIGINT) AS capped_users
        |FROM events GROUP BY event_type""".stripMargin,
    "uniq_cap_str" ->
      """SELECT event_type,
        |  CAST(LEAST(COUNT(DISTINCT props), 50) AS BIGINT) AS capped_props
        |FROM events GROUP BY event_type""".stripMargin,
    "funnel_within" ->
      """SELECT a.user_id,
        |       CAST(a.event_id AS BIGINT) AS a_id,
        |       CAST(b.event_id AS BIGINT) AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin,
    "transition_counts" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events
        |)
        |SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "outlier_events" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |), vc AS (
        |  SELECT event_type, c, COUNT(*) AS cnt FROM e GROUP BY 1, 2
        |), cm AS (
        |  SELECT event_type, c, cnt,
        |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |         SUM(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM vc
        |), med AS (
        |  SELECT event_type, c AS med_c FROM cm
        |  WHERE cum >= (n * 50 + 99) // 100 AND cum - cnt < (n * 50 + 99) // 100
        |), d AS (
        |  SELECT e.event_id, e.event_type, ABS(e.c - med.med_c) AS dev_c
        |  FROM e JOIN med USING (event_type)
        |), dvc AS (
        |  SELECT event_type, dev_c, COUNT(*) AS cnt FROM d GROUP BY 1, 2
        |), dcm AS (
        |  SELECT event_type, dev_c, cnt,
        |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev_c) AS cum,
        |         SUM(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM dvc
        |), mad AS (
        |  SELECT event_type, dev_c AS mad_c FROM dcm
        |  WHERE cum >= (n * 50 + 99) // 100 AND cum - cnt < (n * 50 + 99) // 100
        |)
        |SELECT d.event_id, d.dev_c,
        |       CAST(d.dev_c > 3 * mad.mad_c AS BIGINT) AS is_outlier
        |FROM d JOIN mad USING (event_type)""".stripMargin,
    "bloom_semi_join" ->
      """SELECT event_id, user_id FROM events
        |WHERE user_id IN (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id HAVING COUNT(*) >= 2
        |)""".stripMargin,
    "pivot_events" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
        |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    "rolling_7d" ->
      """SELECT event_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
        |  CAST(SUM(c) OVER w AS BIGINT) AS sum_7d_c
        |FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "gapfill_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS lo,
        |         MAX(CAST(date_trunc('day', ts) AS DATE)) AS hi
        |  FROM events
        |), spine AS (
        |  SELECT t.event_type, CAST(g.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN b
        |  CROSS JOIN LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day) g
        |)
        |SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
        |  COALESCE(d.n, 0) AS n,
        |  COALESCE(last_value(d.sum_c IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS ffill_sum_c
        |FROM spine s LEFT JOIN daily d USING (event_type, day)""".stripMargin,
    "zorder_key" -> {
      // the interleave as 32 explicit bit terms — column 0 (user lane)
      // owns even positions, column 1 (time lane) odd, matching
      // Layout.zvalue's j * k + ci placement
      val terms = (0 until 16).flatMap(j => Seq(
        s"(((qx >> $j) & 1) << ${2 * j})",
        s"(((qy >> $j) & 1) << ${2 * j + 1})"))
      s"""WITH b AS (
         |  SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
         |         MIN(epoch_us(ts)) AS tlo, MAX(epoch_us(ts)) AS thi
         |  FROM events
         |), q AS (
         |  SELECT event_id,
         |    (user_id - ulo) * 65535 // GREATEST(uhi - ulo, 1) AS qx,
         |    (epoch_us(ts) - tlo) * 65535 // GREATEST(thi - tlo, 1) AS qy
         |  FROM events, b
         |)
         |SELECT event_id, CAST(${terms.mkString(" | ")} AS BIGINT) AS z
         |FROM q""".stripMargin
    },
    "cohort_retention" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT user_id, w, MIN(w) OVER (PARTITION BY user_id) AS c
        |  FROM pu
        |)
        |SELECT strftime(c, '%Y-%m-%d') AS cohort,
        |       CAST(date_diff('day', c, w) // 7 AS BIGINT) AS period,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,
    "asof_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts)
        |)
        |SELECT p.user_id, p.event_id, p.ts_us, v.view_id AS asof_view_id
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.ts_us""".stripMargin,
    "value_histogram" ->
      """WITH c AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, user_id
        |), a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS uniq_vals,
        |         CAST(MIN(cnt) AS BIGINT) AS min_cnt,
        |         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |         median(cnt) AS median_cnt,
        |         CAST(SUM(cnt) AS BIGINT) AS s,
        |         CAST(SUM(cnt*cnt) AS BIGINT) AS ss
        |  FROM c GROUP BY event_type
        |)
        |SELECT event_type, uniq_vals, min_cnt, max_cnt, median_cnt,
        |       s / uniq_vals AS mean_cnt,
        |       sqrt((ss - s * s / uniq_vals) / uniq_vals) AS stddev_cnt
        |FROM a""".stripMargin,
    "window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS val_sum_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), m AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1
        |         WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM e
        |), sess AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM m
        |)
        |SELECT user_id, sess_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us
        |FROM sess GROUP BY user_id, sess_id""".stripMargin,
    "range_join_sessions" ->
      """WITH s AS (
        |  WITH e AS (
        |    SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |  ), m AS (
        |    SELECT user_id, event_id, us,
        |      CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1
        |           WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL THEN 1
        |           ELSE 0 END AS new_sess
        |    FROM e
        |  ), sess AS (
        |    SELECT user_id, us,
        |      CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |    FROM m
        |  )
        |  SELECT user_id, sess_id,
        |         CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us
        |  FROM sess GROUP BY user_id, sess_id
        |), p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |)
        |SELECT p.event_id, s.sess_id
        |FROM p JOIN s
        |  ON p.user_id = s.user_id AND p.us BETWEEN s.start_us AND s.end_us""".stripMargin,
    "salted_join" ->
      """WITH d AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, d.type_n
        |FROM events e JOIN d USING (event_type)""".stripMargin,
    "json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS k_sum,
        |  CAST(COUNT(CASE WHEN json_extract_string(props, '$.k')::BIGINT > 50 THEN 1 END) AS BIGINT) AS k_hi
        |FROM events GROUP BY event_type""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Frequent, Quantiles, Snapshots, TextOps}

/** Corpus-statistics workloads: exact distribution quantiles, exact
  * heavy hitters, dictionary phrase matching. These are the profiling
  * lanes a curation pipeline runs BEFORE choosing thresholds — what is
  * the length distribution, which tokens dominate, how often do listed
  * phrases occur — each shaped so the scan-side state is bounded no
  * matter the corpus size.
  */
object StatsQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def toks(c: Column): Column = Dedup.tokens(c)

  /** The phrase dictionary for multi_match, shared with the oracle. The
    * last term self-overlaps ("now now" in "now now now") to pin the
    * leftmost-greedy non-overlap contract, and nests inside another
    * term ("buy now now") to pin per-term independence.
    */
  private val matchTerms =
    Seq("click here", "buy now now", "limited offer", "now now")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact per-source percentiles of document token counts — the
    // distribution profile behind truncation/length-filter threshold
    // picks. Value-count technique: the only full-width pass is the
    // map-only tokenize+count; everything after runs on the bounded
    // (source, n_toks)->count table (plan pinned in PlanSpec).
    "quantile_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      Quantiles.exactPercentiles(
        d.select(col("source"),
          size(toks(col("text"))).cast("long").as("n_toks")),
        "source", col("n_toks"), Seq(10, 25, 50, 75, 90, 99))
    }),

    // Log-histogram quantile SKETCH over document byte sizes — the
    // unbounded-cardinality complement to quantile_stats (byte sizes
    // have too many distinct values for exact value-counting at 100 TB;
    // the log bins cap the state at ~976 buckets per group with a
    // <= 1/16 relative-error bound). Deterministic integer binning
    // (length-of-binary + shifts, no float log), so the oracle replays
    // the sketch bit-for-bit.
    "quantile_sketch" -> ((s, dir) =>
      Quantiles.logHistQuantiles(
        docs(s, dir).select(col("source"),
          octet_length(col("text")).cast("long").as("n_bytes")),
        "source", col("n_bytes"), Seq(50, 90, 99))),

    // Exact heavy hitters over the token stream: Misra-Gries candidate
    // pass (bounded k-counter summary, map-side reduced) then an exact
    // verify count of the <= k candidates — output is every token with
    // cnt*k > n and its EXACT count, no approximation residue.
    "heavy_hitters" -> ((s, dir) =>
      Frequent.heavyHitters(
        docs(s, dir).select(explode(toks(col("text"))).as("token")),
        "token", k = 64)),

    // Crawl-over-crawl snapshot diff: per-doc added/removed/changed/
    // unchanged status. Old and new snapshots are deterministic slices
    // of the fixture (id%7 missing from old, id%13 missing from new,
    // id%5 content-bumped in old), so every status class is populated
    // at every scale and the oracle replays the construction.
    "snapshot_diff" -> ((s, dir) => {
      val id = col("doc_id")
      val d = docs(s, dir)
      val oldSnap = d.filter(id % 7 =!= 0)
        .select(id, when(id % 5 === 0, concat(col("text"), lit(" v1")))
          .otherwise(col("text")).as("text"))
      val newSnap = d.filter(id % 13 =!= 0)
      Snapshots.diff(oldSnap, newSnap, "doc_id", "text")
    }),

    // Token-mass-weighted length percentiles: the smallest doc length
    // covering pct% of each source's TOKEN mass (weight = value =
    // n_toks) — the budgeting statistic; unweighted percentiles
    // over-represent short docs.
    "quantile_weighted" -> ((s, dir) => {
      val d = docs(s, dir)
      val nToks = size(toks(col("text"))).cast("long")
      Quantiles.exactWeightedPercentiles(
        d.select(col("source"), nToks.as("n_toks")),
        "source", col("n_toks"), col("n_toks"), Seq(25, 50, 75, 90))
    }),

    // Per-group exact heavy hitters: each source's dominant tokens (the
    // per-domain boilerplate profile). Grouped MG candidates (bounded
    // state per group, no driver artifact) + exact verify counts.
    "heavy_hitters_by_source" -> ((s, dir) =>
      Frequent.heavyHittersPerGroup(
        docs(s, dir).select(col("source"),
          explode(toks(col("text"))).as("token")),
        "source", "token", k = 32)),

    // Collocation mining: bigrams whose count beats 8x the independence
    // expectation (cross-multiplied exact-integer PMI — no float logs).
    // The fixture text is near-random (max observed lift ~1.6), so
    // collocated phrases are injected deterministically; the operator
    // must find exactly those and nothing else.
    "collocations" -> ((s, dir) => {
      val id = col("doc_id")
      val damaged = concat(col("text"),
        when(id % 3 === 0, lit(" neural network training")).otherwise(lit("")),
        when(id % 4 === 0, lit(" machine learning rocks")).otherwise(lit("")))
      TextOps.collocations(
        docs(s, dir).select(id, damaged.as("text")), "text",
        minCount = 5L, lift = 8L)
    }),

    // Aho-Corasick dictionary matching: per-term non-overlapping phrase
    // counts in one text pass (the blocklist shape regex alternation
    // can't sustain at 10^4+ terms). Phrases are injected
    // deterministically (the pii_scan damage discipline) since the
    // fixture corpus is clean.
    "multi_match" -> ((s, dir) => {
      val id = col("doc_id")
      val damaged = concat(col("text"),
        when(id % 2 === 0, lit(" click here to buy now now")).otherwise(lit("")),
        when(id % 3 === 0, lit(" limited offer click here")).otherwise(lit("")),
        when(id % 5 === 0, lit(" buy now now now")).otherwise(lit("")))
      docs(s, dir)
        .select(id, graft.functions.MatchExpressions
          .multi_match_counts(damaged, matchTerms).as("mc"))
        .select(id,
          element_at(col("mc"), 1).as("n_click"),
          element_at(col("mc"), 2).as("n_buy"),
          element_at(col("mc"), 3).as("n_offer"),
          element_at(col("mc"), 4).as("n_nownow"))
        .withColumn("n_hits",
          col("n_click") + col("n_buy") + col("n_offer") + col("n_nownow"))
        .withColumn("n_terms",
          (col("n_click") > 0).cast("long") + (col("n_buy") > 0).cast("long") +
            (col("n_offer") > 0).cast("long") + (col("n_nownow") > 0).cast("long"))
    }),

    // Incremental aggregate maintenance (the materialized-view-delta
    // discipline): corpus stats computed as ALGEBRAIC partials over two
    // disjoint slices, then merged by the partials' own merge law
    // (cnt/sum add, min/max fold) — the recurring-pipeline shape where
    // yesterday's partial table persists and only the delta slice is
    // scanned. The oracle computes the full-corpus aggregate directly:
    // an independent formulation that agrees exactly IFF the merge is
    // lossless (count/sum/min/max are; avg is derived downstream as
    // sum/cnt, never merged).
    "incremental_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      def partial(df: DataFrame) = df.groupBy(col("source")).agg(
        count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      partial(d.filter(col("doc_id") % 2 === 0))
        .unionByName(partial(d.filter(col("doc_id") % 2 =!= 0)))
        .groupBy(col("source")).agg(
          sum(col("cnt")).as("cnt"), sum(col("sum_chars")).as("sum_chars"),
          min(col("min_chars")).as("min_chars"),
          max(col("max_chars")).as("max_chars"))
    }),

    // Top-k per group through the BOUNDED aggregator, not a window:
    // row_number() OVER (PARTITION BY lang) lands a group's full
    // membership on one task; TopKByScore's map-side partials carry
    // <= k rows per (partition, group) into the shuffle (plan-pinned
    // window-free). Order: score desc, id asc — exactly the oracle's
    // window ordering.
    "topk_by_group" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(graft.functions.Aggregators.topKByScore(
          col("n_chars").cast("double"), col("doc_id"), 3).as("ids"))
        .select(col("lang"), posexplode(col("ids")).as(Seq("i", "doc_id")))
        .select(col("lang"), (col("i") + 1).cast("long").as("rnk"),
          col("doc_id"))),

    // Per-domain document cap — the crawl-mixing rule that stops a
    // mega-domain from dominating the corpus: keep at most k docs per
    // source, chosen by DETERMINISTIC hash rank (md5 of the doc id, so
    // the sample is stable across runs and machines, never
    // arrival-order). Same bounded-aggregator discipline as
    // topk_by_group: map-side partials carry <= k rows per (partition,
    // source) into the shuffle — a row_number window would instead
    // land every mega-domain's full membership on one task. The 52-bit
    // md5 prefix is exact in the aggregator's double score; doc_id
    // breaks ties on both engines.
    "domain_cap" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("h",
          -conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("long").cast("double"))
        .groupBy(col("source"))
        .agg(graft.functions.Aggregators.topKByScore(
          col("h"), col("doc_id"), 15).as("ids"))
        .select(col("source"), explode(col("ids")).as("doc_id"))))

  def oracleSql: Map[String, String] = Map(
    // the sketch's integer bin law: id = x below 16, else
    // (l-4)*16 + (x >> (l-4)) with l = length(bin(x)) - 1; estimate =
    // bucket lower bound ((id - (id//16 - 1)*16) << (id//16 - 1))
    "quantile_sketch" ->
      """WITH d AS (
        |  SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS x
        |  FROM documents
        |), bk AS (
        |  SELECT source,
        |         CASE WHEN x < 16 THEN x
        |              ELSE (length(bin(x)) - 1 - 4) * 16
        |                   + (x >> (length(bin(x)) - 1 - 4)) END AS b
        |  FROM d
        |), vc AS (
        |  SELECT source, b, COUNT(*) AS cnt FROM bk GROUP BY source, b
        |), c AS (
        |  SELECT source, b, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY b) AS cum,
        |         SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM vc
        |)
        |SELECT c.source, CAST(p.pct AS BIGINT) AS pct,
        |       CAST(CASE WHEN b < 16 THEN b
        |                 ELSE (b - (b // 16 - 1) * 16) << (b // 16 - 1)
        |            END AS BIGINT) AS est
        |FROM c, (VALUES (50), (90), (99)) p(pct)
        |WHERE cum >= (n * pct + 99) // 100
        |  AND cum - cnt < (n * pct + 99) // 100""".stripMargin,
    "quantile_stats" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS v
        |  FROM documents
        |), vc AS (
        |  SELECT source, v, COUNT(*) AS cnt FROM t GROUP BY source, v
        |), c AS (
        |  SELECT source, v, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
        |         SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM vc
        |)
        |SELECT c.source, CAST(p.pct AS BIGINT) AS pct, CAST(c.v AS BIGINT) AS val
        |FROM c CROSS JOIN (SELECT unnest([10, 25, 50, 75, 90, 99]) AS pct) p
        |WHERE cum >= (n * pct + 99) // 100
        |  AND cum - cnt < (n * pct + 99) // 100""".stripMargin,
    "heavy_hitters" ->
      """WITH tk AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), tot AS (SELECT COUNT(*) AS n FROM tk)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM tk CROSS JOIN tot
        |GROUP BY token, n
        |HAVING COUNT(*) * 64 > n""".stripMargin,
    "quantile_weighted" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS v
        |  FROM documents
        |), vc AS (
        |  SELECT source, v, SUM(v) AS cnt FROM t GROUP BY source, v HAVING SUM(v) > 0
        |), c AS (
        |  SELECT source, v, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
        |         SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM vc
        |)
        |SELECT c.source, CAST(p.pct AS BIGINT) AS pct, CAST(c.v AS BIGINT) AS val
        |FROM c CROSS JOIN (SELECT unnest([25, 50, 75, 90]) AS pct) p
        |WHERE cum >= (n * pct + 99) // 100
        |  AND cum - cnt < (n * pct + 99) // 100""".stripMargin,
    "heavy_hitters_by_source" ->
      """WITH tk AS (
        |  SELECT source,
        |         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), tot AS (SELECT source, COUNT(*) AS n FROM tk GROUP BY source)
        |SELECT tk.source, token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM tk JOIN tot USING (source)
        |GROUP BY tk.source, token, n
        |HAVING COUNT(*) * 32 > n""".stripMargin,
    "snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id,
        |         md5(text || CASE WHEN doc_id % 5 = 0 THEN ' v1' ELSE '' END) AS h_old
        |  FROM documents WHERE doc_id % 7 <> 0
        |), n AS (
        |  SELECT doc_id, md5(text) AS h_new FROM documents WHERE doc_id % 13 <> 0
        |)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN h_old IS DISTINCT FROM h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    "collocations" ->
      """WITH d AS (
        |  SELECT text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' neural network training' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN ' machine learning rocks' ELSE '' END AS t
        |  FROM documents
        |), tk AS (
        |  SELECT list_filter(string_split_regex(t, '\s+'), x -> x <> '') AS toks FROM d
        |), bg AS (
        |  SELECT toks[i] AS w1, toks[i+1] AS w2
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
        |), c12 AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
        |), h AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |t2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
        |n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM c12)
        |SELECT w1, w2, c12, c1, c2, n.n AS n
        |FROM c12 JOIN h USING (w1) JOIN t2 USING (w2) CROSS JOIN n
        |WHERE c12 >= 5
        |  AND CAST(c12 AS HUGEINT) * n.n >= 8 * CAST(c1 AS HUGEINT) * c2""".stripMargin,
    "multi_match" ->
      """WITH d AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 2 = 0 THEN ' click here to buy now now' ELSE '' END
        |    || CASE WHEN doc_id % 3 = 0 THEN ' limited offer click here' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' buy now now now' ELSE '' END AS t
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(t, 'click here')) - 1 AS BIGINT) AS n_click,
        |    CAST(len(string_split(t, 'buy now now')) - 1 AS BIGINT) AS n_buy,
        |    CAST(len(string_split(t, 'limited offer')) - 1 AS BIGINT) AS n_offer,
        |    CAST(len(string_split(t, 'now now')) - 1 AS BIGINT) AS n_nownow
        |  FROM d
        |)
        |SELECT doc_id, n_click, n_buy, n_offer, n_nownow,
        |       n_click + n_buy + n_offer + n_nownow AS n_hits,
        |       CAST(n_click > 0 AS BIGINT) + CAST(n_buy > 0 AS BIGINT)
        |         + CAST(n_offer > 0 AS BIGINT) + CAST(n_nownow > 0 AS BIGINT) AS n_terms
        |FROM m""".stripMargin,
    "incremental_stats" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |       CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY source""".stripMargin,
    "topk_by_group" ->
      """SELECT lang, CAST(rn AS BIGINT) AS rnk, doc_id FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents
        |) WHERE rn <= 3""".stripMargin,
    // the kept set under the deterministic 52-bit md5-prefix rank
    "domain_cap" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT ASC,
        |                    doc_id ASC) AS rn
        |  FROM documents
        |) WHERE rn <= 15""".stripMargin)
}

package graft.queries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QuerySupport._
import graft.sources.Tables.{load, parallel}
import graft.functions.Timestamps
import graft.functions.TextFunctions
import graft.operators.{CorpusStats, Curation, DataQuality, Dedup, EntityResolution, Graph, IncrementalAgg, Itemsets, Maintenance, Merge, Profiling, Quantization, Relational, Retention, Sessionize, Similarity, TextDedup, TimeSeries}
/** Events, time series and graph: gap-fill, drift, rolling stats,
  * survival, seasonality, transitions, PageRank, triangles,
  * association rules.
  *
  * One registry entry per operator with its DuckDB oracle SQL
  * (driver contract, SURVEY.md §7); aggregated by
  * [[graft.SparkEntry]]. Bodies moved verbatim from SparkEntry
  * in the round-12 registry split — entry names, plans and
  * oracles are unchanged. */
private[graft] object EventsQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Dense hourly grid per user with zero-filled counts and
    // last-observation-carried-forward sums — irregular events to the
    // fixed cadence downstream features expect. Buckets surface as epoch
    // seconds so both engines compare integers, not timezone renderings.
    "q85_gap_fill" -> ((s, d) => {
      TimeSeries.gapFill(parallel(load(s, d, "events")),
          "user_id", "ts", "value", bucketSeconds = 3600L)
        .select(col("user_id"),
          unix_timestamp(col("bucket")).as("bucket_epoch"),
          col("n_events"), col("bucket_sum"), col("filled_sum"))
        .transform(ordered1(_, col("user_id"), col("bucket_epoch")))
    }),


    // Linear interpolation onto the q85 hourly grid — time-weighted
    // straight line between observed bucket sums instead of LOCF.
    "q93_interpolate" -> ((s, d) => {
      TimeSeries.interpolate(parallel(load(s, d, "events")),
          "user_id", "ts", "value", bucketSeconds = 3600L)
        .select(col("user_id"),
          unix_timestamp(col("bucket")).as("bucket_epoch"),
          col("n_events"), col("bucket_sum"), col("interp_sum"))
        .transform(ordered1(_, col("user_id"), col("bucket_epoch")))
    }),


    // Recency-weighted activity score per user: value halves per week of
    // age from a fixed batch anchor — the feature-store staple. The decay
    // divisor is a long SHIFT (exact power of two), never libm pow.
    "q121_decayed_sum" -> ((s, d) => {
      TimeSeries.decayedSum(load(s, d, "events"), "user_id", "ts", "value",
          anchor = "2024-02-01 00:00:00", halfLifeSeconds = 604800L)
        .transform(ordered1(_, col("user_id")))
    }),


    // Inter-event burstiness per user (CV of gap seconds) — the
    // bot-vs-human cadence signal; integer-exact moments.
    "q122_burstiness" -> ((s, d) => {
      Sessionize.interEventStats(load(s, d, "events"), "user_id", "ts",
          tieBreak = Seq(col("event_id")))
        .transform(ordered1(_, col("user_id")))
    }),


    // Market-basket co-occurrence: top part pairs by shared-order count —
    // association mining's support table. Round 13: migrated from the
    // exchange-reused self-join (coOccurrencePairs, kept as the
    // GraftProps cross-check) onto the one-shuffle coOccurrenceEdges
    // build (collect_set + map-side HOF pair expansion, maxBasket
    // fail-fast) — the round-12 A/B measured 0.76 s vs 1.1 s for the
    // same shape; top-k stays TakeOrderedAndProject.
    "q123_copurchase" -> ((s, d) => {
      // No parallel(): the repartition is a full extra 600k-row
      // exchange ahead of the collect_set shuffle — A/B'd 1.53 s vs
      // 0.88 s, the agg's own exchange already spreads the pair
      // expansion (which runs post-agg, not on the scan). Round 15:
      // packed-long pair keys (partkeys are integral < 2^31 here, the
      // guard enforces it) — q123_ab A/B 0.93/0.99 -> 0.84/0.90 s.
      Itemsets.coOccurrenceEdgesPacked(load(s, d, "lineitem"),
          "l_orderkey", "l_partkey")
        .select(col("item_a").as("part_a"), col("item_b").as("part_b"),
          col("n_groups").as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(50)
    }),


    // Trailing 24h rolling count+sum as of each event (RANGE frame over
    // epoch seconds — the time-window sibling of q14's ROWS frames).
    "q124_rolling_window" -> ((s, d) => {
      TimeSeries.rollingSum(load(s, d, "events"), "user_id", "ts", "value",
          windowSeconds = 86400L)
        .select(col("event_id"), col("user_id"), col("rolling_n"),
          col("rolling_sum"))
        .transform(ordered1(_, col("event_id")))
    }),


    // One-sided CUSUM level-shift detection on hourly per-type rates
    // (running-sum minus running-min closed form; integer-exact flags).
    "q125_cusum_shift" -> ((s, d) => {
      TimeSeries.cusumChangePoints(load(s, d, "events"), "event_type", "ts",
          bucketSeconds = 3600L, driftK = 3L, threshold = 12L)
        .transform(ordered1(_, col("event_type"), col("bucket_epoch")))
    }),


    // Lag-1 autocorrelation of zero-filled hourly rates per type — the
    // burst-persistence/seasonality probe; exact long moments.
    "q126_rate_autocorr" -> ((s, d) => {
      TimeSeries.rateAutocorr(load(s, d, "events"), "event_type", "ts",
          bucketSeconds = 3600L)
        .transform(ordered1(_, col("event_type")))
    }),


    // Next-event transition matrix per user timeline — empirical Markov
    // transition counts + per-from-state shares.
    "q116_transitions" -> ((s, d) => {
      Sessionize.transitionMatrix(load(s, d, "events"),
          "user_id", "ts", "event_type", tiebreakCol = "event_id")
        .transform(ordered1(_, col("from_type"), col("to_type")))
    }),


    // Per-type Gini concentration of user event counts — the bot /
    // power-user traffic audit (exact-integer numerator; one window over
    // |users| rows per type).
    "q115_event_gini" -> ((s, d) => {
      Relational.giniConcentration(load(s, d, "events"),
          "event_type", "user_id")
        .transform(ordered1(_, col("event_type")))
    }),


    // Hourly event-rate anomalies per type: z-scores over the zero-filled
    // hourly grid, |z| >= 2 — integer-exact moments, so the flag boundary
    // is engine-deterministic.
    "q114_rate_anomaly" -> ((s, d) => {
      TimeSeries.rateAnomaly(load(s, d, "events"), "event_type", "ts",
          bucketSeconds = 3600L, zCut = 2.0)
        .transform(ordered1(_, col("event_type"), col("bucket")))
    }),


    // Kaplan-Meier user-lifetime curve: per-user observed span in days,
    // censored when the user was still active in the final week. The
    // cumulative log-survival window runs over the bounded distinct-
    // duration frame only.
    "q185_survival_km" -> ((s, d) => {
      val e = load(s, d, "events")
      val spans = e.groupBy(col("user_id"))
        .agg(min(col("ts")).as("__first"), max(col("ts")).as("__last"))
      val cut = e.agg(max(col("ts")).as("__maxts"))
      val durations = spans.crossJoin(broadcast(cut))
        .select(datediff(col("__last"), col("__first")).as("dur"),
          when(col("__last") < col("__maxts") - expr("INTERVAL 7 DAYS"), 1L)
            .otherwise(0L).as("ev"))
      TimeSeries.kaplanMeier(durations, col("dur"), col("ev"))
        .transform(ordered1(_, col("duration")))
    }),


    // Day-of-week x hour-of-day load shape with gap to the global mean
    // value; dow normalized to 0=Sunday on both engines.
    "q196_seasonal_profile" -> ((s, d) => {
      TimeSeries.seasonalProfile(load(s, d, "events"), col("ts"),
          col("value"))
        .transform(ordered1(_, col("dow"), col("hour")))
    }),


    // Hierarchical share-of-parent rollup: nation order value as a
    // share of its region and of the total. Exact unscaled-long
    // partials ride BOTH windows on one exchange (long addition is
    // associative, so the window re-sums are exact).
    "q215_share_of_parent" -> ((s, d) => {
      val base = load(s, d, "orders")
        .join(load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(load(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
      val agg = base.groupBy(col("r_name"), col("n_name"))
        .agg(dsumPartial(col("o_totalprice"), 2).as("__p"))
      import org.apache.spark.sql.expressions.{Window => W}
      agg
        .withColumn("__pr", sum(col("__p")).over(
          W.partitionBy(col("r_name"))))
        .withColumn("__pt", sum(col("__p")).over(W.partitionBy()))
        .select(col("r_name"), col("n_name"),
          graft.functions.Decimals.fromUnscaled(col("__p"), 2)
            .as("nation_rev"),
          round(col("__p").cast("double") / col("__pr").cast("double"), 6)
            .as("share_of_region"),
          round(col("__p").cast("double") / col("__pt").cast("double"), 6)
            .as("share_of_total"))
        .transform(ordered1(_, col("r_name"), col("n_name")))
    }),


    // 7-day trailing rolling median of daily event counts per type —
    // the robust smoother; bounded collect_list window, exact halves.
    "q227_rolling_median" -> ((s, d) => {
      val e = load(s, d, "events")
      val daily = e.filter(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeries.rollingMedian(daily, "event_type", "day", "n", 7)
        .transform(ordered1(_, col("event_type"), col("day")))
    }),


    // Order-3 permutation entropy of the value series per event type:
    // ordinal-pattern complexity, stable tie convention.
    "q230_perm_entropy" -> ((s, d) => {
      val e = load(s, d, "events")
      TimeSeries.permutationEntropy(
          e.filter(col("ts").isNotNull), "event_type", "ts", "event_id",
          col("value"))
        .transform(ordered1(_, col("key")))
    }),


    // Isotonic calibration of the q218 squash against label>=5 via the
    // declarative minimax-PAV identity — everything quadratic runs on
    // the bounded score-bin histogram.
    "q234_isotonic" -> ((s, d) => {
      val emb = parallel(load(s, d, "embeddings"))
      val p = greatest(lit(0.0), least(lit(1.0),
        round(lit(0.5) + element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1) / lit(4.0), 3)))
      graft.operators.Evaluation.isotonicFit(
          emb.filter(col("label").isNotNull)
            .select(p.as("p"), (col("label") >= 5).cast("int").as("y")),
          col("p"), col("y"))
        .transform(ordered1(_, col("score")))
    }),


    // Lead/lag cross-correlation of daily click vs purchase counts at
    // lags -3..3 — exact integer moment folds, one shifted equi-join.
    "q235_xcorr" -> ((s, d) => {
      val e = load(s, d, "events")
      def daily(t: String) = e
        .filter(col("event_type") === t && col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      TimeSeries.crossCorrelation(daily("click"), daily("purchase"),
          "day", "n", maxLag = 3)
        .transform(ordered1(_, col("lag")))
    }),


    // Directed association rules over per-user event-type baskets:
    // support/confidence/lift/conviction, top-20 by lift.
    "q241_assoc_rules" -> ((s, d) => {
      Itemsets.associationRules(load(s, d, "events"), "user_id",
          "event_type", minCount = 5L, topK = 20)
        .transform(ordered1(_, col("lift").desc, col("antecedent"),
          col("consequent")))
    }),


    // ABC / Pareto customer segmentation on exact integer cumulative
    // shares (cum*5 <= tot*4 for A, cum*20 <= tot*19 for B) — no float
    // boundary.
    "q221_abc_segments" -> ((s, d) => {
      val spend = load(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsumPartial(col("o_totalprice"), 2).as("__p"))
      val wc = org.apache.spark.sql.expressions.Window
        .orderBy(col("__p").desc, col("o_custkey").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val cls = spend
        .withColumn("__cum", sum(col("__p")).over(wc))
        .crossJoin(broadcast(spend.agg(sum(col("__p")).as("__tot"))))
        .withColumn("abc_class",
          when(col("__cum").cast(dec38) * 5 <=
            col("__tot").cast(dec38) * 4, "A")
            .when(col("__cum").cast(dec38) * 20 <=
              col("__tot").cast(dec38) * 19, "B")
            .otherwise("C"))
      cls.groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_customers"),
          graft.functions.Decimals.fromUnscaled(sum(col("__p")), 2)
            .as("revenue"),
          round(sum(col("__p")).cast("double") /
            max(col("__tot")).cast("double"), 6).as("rev_share"))
        .transform(ordered1(_, col("abc_class")))
    }),


    // Next-event predictability: conditional entropy per prev type
    // from one lead-window pass over the per-user order.
    "q214_transition_entropy" -> ((s, d) => {
      Sessionize.transitionEntropy(load(s, d, "events"), "user_id", "ts",
          "event_id", "event_type")
        .transform(ordered1(_, col("event_type")))
    }),


    // Seasonally-contextualized anomalies: top-10 (dow, hour) buckets
    // whose mean deviates beyond the pooled-noise envelope.
    "q209_seasonal_anomaly" -> ((s, d) => {
      TimeSeries.seasonalAnomalies(load(s, d, "events"), col("ts"),
        col("value"), k = 10)
    }),


    // First-touch vs last-touch credit for the events preceding each
    // user's first purchase — one window pass over prior events.
    "q205_attribution" -> ((s, d) => {
      Sessionize.touchAttribution(load(s, d, "events"), "user_id", "ts",
          "event_id", "event_type", "purchase")
        .transform(ordered1(_, col("event_type")))
    }),


    // Weighted PageRank over the event-type transition graph, 3 exact
    // iterations with uniform dangling redistribution — the iterative-
    // analytics shape (join + agg per step, checkpointed node frame,
    // decimal-quantized messages) the oracle replays unrolled.
    "q155_pagerank" -> ((s, d) => {
      val edges = Sessionize.transitionMatrix(load(s, d, "events"),
        "user_id", "ts", "event_type", tiebreakCol = "event_id")
      Graph.pageRank(edges, "from_type", "to_type", "n", iterations = 3)
        .transform(ordered1(_, col("node")))
    }),


    // Triangle counts + clustering coefficients over the co-purchase
    // graph (part pairs sharing >= 2 orders): once-only path-join
    // enumeration behind the maxDegree wedge-bomb guard. Round-12
    // structural rework (the round-11 verdict's q156 swing): the edge
    // list builds via Itemsets.coOccurrenceEdges' one-shuffle sorted-set
    // pair expansion (vs distinct -> self-join -> agg), and the
    // n>=2-thresholded graph is small by construction, so the wedge
    // legs take triangleStats' broadcast regime. A/B at sf0.1:
    // 1.16 s -> 0.84 s min-of-3 (Prof q156_ab).
    "q156_triangles" -> ((s, d) => {
      val edges = Itemsets.coOccurrenceEdgesPacked(load(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minGroups = 2L)
      Graph.triangleStats(edges, "item_a", "item_b",
          broadcastWedges = true)
        .transform(ordered1(_, col("node")))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q85_gap_fill" ->
      """WITH pb AS (SELECT user_id,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_epoch,
        |    count(*) AS n_events, sum(CAST(value AS DECIMAL(18,6))) AS s
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(bucket_epoch) AS lo, max(bucket_epoch) AS hi
        |  FROM pb GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS bucket_epoch
        |  FROM sp)
        |SELECT g.user_id, g.bucket_epoch,
        |  coalesce(pb.n_events, 0) AS n_events,
        |  CAST(pb.s AS DOUBLE) AS bucket_sum,
        |  CAST(last_value(pb.s IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.bucket_epoch ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS filled_sum
        |FROM grid g LEFT JOIN pb
        |  ON g.user_id = pb.user_id AND g.bucket_epoch = pb.bucket_epoch
        |ORDER BY g.user_id, g.bucket_epoch""".stripMargin,


    "q93_interpolate" ->
      """WITH pb AS (SELECT user_id,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_epoch,
        |    count(*) AS n_events, sum(CAST(value AS DECIMAL(18,6))) AS s
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(bucket_epoch) AS lo, max(bucket_epoch) AS hi
        |  FROM pb GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS bucket_epoch
        |  FROM sp),
        |j AS (SELECT g.user_id, g.bucket_epoch, pb.n_events, pb.s
        |  FROM grid g LEFT JOIN pb
        |    ON g.user_id = pb.user_id AND g.bucket_epoch = pb.bucket_epoch),
        |w AS (SELECT user_id, bucket_epoch, n_events, s,
        |  CAST(last_value(CAST(s * 1000000 AS BIGINT) IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY bucket_epoch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS pv,
        |  last_value(CASE WHEN s IS NOT NULL THEN bucket_epoch END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY bucket_epoch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |  CAST(first_value(CAST(s * 1000000 AS BIGINT) IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY bucket_epoch
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS HUGEINT) AS nv,
        |  first_value(CASE WHEN s IS NOT NULL THEN bucket_epoch END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY bucket_epoch
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM j),
        |u AS (SELECT user_id, bucket_epoch, n_events, s,
        |  CASE WHEN s IS NOT NULL THEN CAST(s * 1000000 AS BIGINT)
        |    ELSE CAST((2 * (pv * (nt - bucket_epoch) + nv * (bucket_epoch - pt))
        |      + (nt - pt)) // (2 * (nt - pt)) AS BIGINT) END AS iu
        |  FROM w)
        |SELECT user_id, bucket_epoch,
        |  coalesce(n_events, 0) AS n_events,
        |  CAST(s AS DOUBLE) AS bucket_sum,
        |  CAST(iu AS DOUBLE) / 1000000 AS interp_sum
        |FROM u ORDER BY user_id, bucket_epoch""".stripMargin,


    "q121_decayed_sum" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value / (1::BIGINT << CAST(GREATEST(LEAST(
        |      (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
        |        // 604800000000, 60), 0) AS INT))
        |    AS DECIMAL(18,6))) AS DOUBLE) AS decayed_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,


    "q122_burstiness" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
        |  FROM events),
        |s AS (SELECT user_id, COUNT(*) AS n_gaps, SUM(gap) AS sg,
        |    SUM(gap * gap) AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  round(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_s,
        |  CASE WHEN sg > 0 THEN round(
        |    sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE), 6)
        |  END AS cv_gap
        |FROM s ORDER BY user_id""".stripMargin,


    "q123_copurchase" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  COUNT(*) AS n_orders
        |FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 50""".stripMargin,


    "q124_rolling_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS rolling_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS rolling_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(ts) // 1000000
        |  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,


    "q125_cusum_shift" ->
      """WITH c AS (SELECT event_type,
        |    (epoch_us(ts) // 1000000 // 3600) * 3600 AS bucket_epoch,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |bnd AS (SELECT event_type, min(bucket_epoch) AS lo,
        |    max(bucket_epoch) AS hi
        |  FROM c GROUP BY event_type),
        |g AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, 3600)) AS bucket_epoch
        |  FROM bnd),
        |f AS (SELECT g.event_type, g.bucket_epoch,
        |    coalesce(c.x, 0) AS x
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type
        |    AND g.bucket_epoch = c.bucket_epoch),
        |cu AS (SELECT event_type, bucket_epoch, x,
        |    SUM(x - 3) OVER (PARTITION BY event_type
        |      ORDER BY bucket_epoch) AS c
        |  FROM f),
        |s AS (SELECT event_type, bucket_epoch, x,
        |    c - LEAST(MIN(c) OVER (PARTITION BY event_type
        |      ORDER BY bucket_epoch), 0) AS s
        |  FROM cu)
        |SELECT event_type, bucket_epoch, x AS n_events,
        |  CAST(s AS BIGINT) AS cusum
        |FROM s WHERE s >= 12
        |ORDER BY event_type, bucket_epoch""".stripMargin,


    "q126_rate_autocorr" ->
      """WITH c AS (SELECT event_type,
        |    (epoch_us(ts) // 1000000 // 3600) * 3600 AS bucket_epoch,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |bnd AS (SELECT event_type, min(bucket_epoch) AS lo,
        |    max(bucket_epoch) AS hi
        |  FROM c GROUP BY event_type),
        |g AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, 3600)) AS bucket_epoch
        |  FROM bnd),
        |f AS (SELECT g.event_type, g.bucket_epoch,
        |    coalesce(c.x, 0) AS x
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type
        |    AND g.bucket_epoch = c.bucket_epoch),
        |p AS (SELECT event_type, x,
        |    lead(x) OVER (PARTITION BY event_type
        |      ORDER BY bucket_epoch) AS y
        |  FROM f),
        |m AS (SELECT event_type, count(*) AS n_pairs,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM p WHERE y IS NOT NULL GROUP BY event_type),
        |v AS (SELECT event_type, n_pairs, sx, sy, sxy,
        |    n_pairs * sxx - sx * sx AS vx,
        |    n_pairs * syy - sy * sy AS vy
        |  FROM m)
        |SELECT event_type, n_pairs,
        |  CASE WHEN vx > 0 AND vy > 0 THEN round(
        |    (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6)
        |  END AS lag1_autocorr
        |FROM v ORDER BY event_type""".stripMargin,


    "q116_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n,
        |  round(CAST(count(*) AS DOUBLE)
        |    / sum(count(*)) OVER (PARTITION BY from_type), 6) AS share
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,


    "q115_event_gini" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY x ASC, user_id ASC) AS i
        |  FROM c)
        |SELECT event_type, count(*) AS n_entities,
        |  CAST(sum(x) AS BIGINT) AS n_rows,
        |  round(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
        |    / CAST(count(*) * sum(x) AS DOUBLE), 6) AS gini
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,


    "q114_rate_anomaly" ->
      """WITH c AS (SELECT event_type,
        |    date_trunc('hour', ts) AS bucket,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |  FROM c GROUP BY 1),
        |b AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM mm),
        |f AS (SELECT b.event_type, b.bucket, coalesce(c.x, 0) AS x
        |  FROM b LEFT JOIN c ON c.event_type = b.event_type
        |                    AND c.bucket = b.bucket),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
        |    sum(x * x) AS sxx FROM f GROUP BY 1)
        |SELECT f.event_type, f.bucket, CAST(x AS BIGINT) AS n_events,
        |  round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           / CAST(n * n AS DOUBLE)), 6) AS z
        |FROM f JOIN s ON s.event_type = f.event_type
        |WHERE CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE) > 0
        |  AND abs((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           / CAST(n * n AS DOUBLE))) >= 2.0
        |ORDER BY f.event_type, f.bucket""".stripMargin,


    "q156_triangles" ->
      """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS x, b.l_partkey AS y
        |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        |  (SELECT x AS node FROM e UNION ALL SELECT y FROM e) GROUP BY node),
        |tri AS (SELECT e1.x AS na, e1.y AS nb, e2.y AS nc
        |  FROM e e1 JOIN e e2 ON e1.y = e2.x
        |  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
        |  (SELECT na AS node FROM tri UNION ALL SELECT nb FROM tri
        |   UNION ALL SELECT nc FROM tri) GROUP BY node)
        |SELECT deg.node, deg.degree,
        |  COALESCE(pn.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    ROUND(CAST(COALESCE(pn.n_triangles, 0) * 2 AS DOUBLE)
        |      / CAST(deg.degree * (deg.degree - 1) AS DOUBLE), 6)
        |  END AS clustering
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY deg.node""".stripMargin,


    "q155_pagerank" ->
      s"""WITH pr AS (SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts ASC, event_id ASC) AS dst
         |  FROM events),
         |e AS (SELECT src, dst, count(*) AS n FROM pr
         |  WHERE dst IS NOT NULL GROUP BY src, dst),
         |t AS (SELECT src, dst,
         |    CAST(n AS DOUBLE) / sum(CAST(n AS DOUBLE)) OVER (PARTITION BY src) AS p
         |  FROM e),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
         |r0 AS (SELECT node, 1.0 / (SELECT nn FROM nc) AS rank FROM nodes),
         |${prIterSql(1)},
         |${prIterSql(2)},
         |${prIterSql(3)}
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,


    // ln/exp cumulative product over the distinct-duration frame, the
    // e = r step pinned to -infinity — TimeSeries.kaplanMeier's sequence.
    "q185_survival_km" ->
      """WITH spans AS (SELECT user_id, min(ts) AS f, max(ts) AS l
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(ts) AS m FROM events),
        |d AS (SELECT CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
        |      AS DOUBLE) AS duration,
        |    CASE WHEN l < m - INTERVAL 7 DAY THEN 1 ELSE 0 END AS ev
        |  FROM spans CROSS JOIN cut),
        |g AS (SELECT duration, CAST(sum(ev) AS BIGINT) AS n_event,
        |    CAST(count(*) - sum(ev) AS BIGINT) AS n_censored,
        |    count(*) AS c FROM d GROUP BY duration),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
        |r AS (SELECT duration, n_event, n_censored,
        |    CAST(t.n - sum(c) OVER (ORDER BY duration
        |      ROWS UNBOUNDED PRECEDING) + c AS BIGINT) AS n_risk
        |  FROM g CROSS JOIN t)
        |SELECT duration, n_risk, n_event, n_censored,
        |  round(exp(sum(CASE
        |      WHEN n_event > 0 AND n_event < n_risk THEN
        |        ln(1 - CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      WHEN n_event > 0 THEN CAST('-infinity' AS DOUBLE)
        |      ELSE 0.0 END)
        |    OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING)), 6)
        |    AS survival
        |FROM r ORDER BY duration""".stripMargin,


    // dow spelled to 0=Sunday on both engines; value quantized at the
    // repo DECIMAL(18,6) convention, one exact integer sum per bucket.
    "q196_seasonal_profile" ->
      """WITH b AS (SELECT CAST(dayofweek(ts) AS INT) AS dow,
        |    CAST(extract(hour FROM ts) AS INT) AS hour,
        |    CAST(value AS DECIMAL(18,6)) AS q
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT count(*) AS gn,
        |    CAST(CAST(sum(q) * 1000000 AS HUGEINT) AS DOUBLE) AS gs
        |  FROM b),
        |k AS (SELECT dow, hour, count(*) AS n,
        |    CAST(CAST(sum(q) * 1000000 AS HUGEINT) AS DOUBLE) AS s
        |  FROM b GROUP BY dow, hour)
        |SELECT dow, hour, n,
        |  round(s / 1000000.0 / n, 6) AS mean_value,
        |  round(s / 1000000.0 / n - gs / 1000000.0 / gn, 6) AS mean_gap
        |FROM k, g ORDER BY dow, hour""".stripMargin,


    // Bounded list() window + list_sort mirrors TimeSeries.rollingMedian
    // exactly (native median()'s even-count semantics stay out of the
    // contract).
    "q227_rolling_median" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |    list_sort(list(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
        |  FROM d)
        |SELECT event_type, day, n,
        |  (l[(len(l) + 1) // 2] + l[len(l) // 2 + 1]) / 2.0
        |    AS rolling_median
        |FROM w ORDER BY event_type, day""".stripMargin,


    // The 6-way stable-ordinal CASE mirrors TimeSeries
    // .permutationEntropy; entropy folds over <= 6 patterns per key.
    "q230_perm_entropy" ->
      """WITH s AS (SELECT event_type AS k, ts, event_id,
        |    CAST(value AS DOUBLE) AS v1
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |l AS (SELECT k, v1,
        |    lead(v1, 1) OVER (PARTITION BY k ORDER BY ts, event_id) AS v2,
        |    lead(v1, 2) OVER (PARTITION BY k ORDER BY ts, event_id) AS v3
        |  FROM s),
        |p AS (SELECT k, CASE
        |    WHEN v1 <= v2 AND v2 <= v3 THEN '123'
        |    WHEN v1 <= v2 AND NOT v2 <= v3 AND v1 <= v3 THEN '132'
        |    WHEN v1 <= v2 AND NOT v2 <= v3 AND NOT v1 <= v3 THEN '312'
        |    WHEN NOT v1 <= v2 AND v1 <= v3 THEN '213'
        |    WHEN NOT v1 <= v2 AND NOT v1 <= v3 AND v2 <= v3 THEN '231'
        |    ELSE '321' END AS pat
        |  FROM l WHERE v2 IS NOT NULL AND v3 IS NOT NULL),
        |c AS (SELECT k, pat, count(*) AS c FROM p GROUP BY 1, 2),
        |t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n_triples,
        |    count(*) AS n_patterns FROM c GROUP BY k)
        |SELECT c.k AS key, t.n_triples, t.n_patterns,
        |  round(sum(-(CAST(c.c AS DOUBLE) / CAST(t.n_triples AS DOUBLE)) *
        |    ln(CAST(c.c AS DOUBLE) / CAST(t.n_triples AS DOUBLE))) /
        |    ln(2), 6) AS perm_entropy,
        |  round(round(sum(-(CAST(c.c AS DOUBLE) /
        |      CAST(t.n_triples AS DOUBLE)) *
        |    ln(CAST(c.c AS DOUBLE) / CAST(t.n_triples AS DOUBLE))) /
        |    ln(2), 6) / (ln(6) / ln(2)), 6) AS normalized
        |FROM c JOIN t ON c.k = t.k
        |GROUP BY c.k, t.n_triples, t.n_patterns
        |ORDER BY key""".stripMargin,


    // The minimax identity fit_i = max_{j<=i} min_{k>=i} wavg[j..k]
    // mirrors Evaluation.isotonicFit: exact prefix differences, one
    // IEEE division per grid cell, min/max never round.
    "q234_isotonic" ->
      """WITH s AS (SELECT greatest(0.0, least(1.0,
        |      round(0.5 + CAST(embedding AS DOUBLE[])[1] / 4.0, 3)))
        |      AS score,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings WHERE label IS NOT NULL),
        |bins AS (SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
        |  FROM s GROUP BY score),
        |pre AS (SELECT score, n, sy,
        |    row_number() OVER (ORDER BY score) AS i,
        |    CAST(sum(n) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cn,
        |    CAST(sum(sy) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cs
        |  FROM bins),
        |grid AS (SELECT a.i AS j, b.i AS k,
        |    CAST(b.cs - (a.cs - a.sy) AS DOUBLE) /
        |      CAST(b.cn - (a.cn - a.n) AS DOUBLE) AS avgv
        |  FROM pre a JOIN pre b ON a.i <= b.i),
        |mm AS (SELECT j, k, min(avgv) OVER (PARTITION BY j ORDER BY k DESC
        |    ROWS UNBOUNDED PRECEDING) AS m FROM grid),
        |fit AS (SELECT k AS i, max(m) AS f FROM mm GROUP BY k)
        |SELECT p.score, p.n,
        |  round(CAST(p.sy AS DOUBLE) / CAST(p.n AS DOUBLE), 6) AS y_rate,
        |  round(f.f, 6) AS iso_fit
        |FROM pre p JOIN fit f ON p.i = f.i ORDER BY p.score""".stripMargin,


    // Shifted equi-join per lag; HUGEINT moment folds and the spearman
    // -style one-step Pearson ratio mirror TimeSeries.crossCorrelation.
    "q235_xcorr" ->
      """WITH x AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS t, CAST(count(*) AS HUGEINT) AS x
        |  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
        |  GROUP BY 1),
        |y0 AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) AS tb, CAST(count(*) AS HUGEINT) AS y
        |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        |  GROUP BY 1),
        |l AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        |y AS (SELECT y0.tb - l.lag AS t, l.lag, y0.y
        |  FROM y0 CROSS JOIN l),
        |m AS (SELECT lag, count(*) AS n,
        |    sum(x.x) AS sx, sum(y.y) AS sy, sum(x.x * x.x) AS sxx,
        |    sum(y.y * y.y) AS syy, sum(x.x * y.y) AS sxy
        |  FROM x JOIN y ON x.t = y.t GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx > 0
        |        AND CAST(n AS HUGEINT) * syy - sy * sy > 0 THEN
        |    round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
        |        CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)), 6)
        |    END AS corr
        |FROM m ORDER BY lag""".stripMargin,


    // Mirrors Itemsets.associationRules: exact basket/item/pair
    // counts, top-20 cut on the UNROUNDED lift (deterministic double)
    // with (antecedent, consequent) tiebreak, rounded output order.
    "q241_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT user_id AS g, event_type AS i
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS nn FROM it),
        |c AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM it GROUP BY i),
        |p AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS cab
        |  FROM it a JOIN it b ON a.g = b.g AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |d AS (SELECT ia AS ant, ib AS con, cab FROM p
        |  UNION ALL SELECT ib, ia, cab FROM p),
        |j AS (SELECT d.ant, d.con, d.cab, ca.ci AS ca, cb.ci AS cb, nb.nn
        |  FROM d JOIN c ca ON d.ant = ca.i JOIN c cb ON d.con = cb.i
        |  CROSS JOIN nb),
        |k AS (SELECT ant, con, cab, ca, cb, nn,
        |    CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE) AS conf,
        |    CAST(cab AS DOUBLE) * CAST(nn AS DOUBLE) /
        |      (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) AS lift
        |  FROM j),
        |t AS (SELECT * FROM k ORDER BY lift DESC, ant, con LIMIT 20)
        |SELECT ant AS antecedent, con AS consequent, cab AS n_both,
        |  round(CAST(cab AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS support,
        |  round(conf, 6) AS confidence,
        |  round(lift, 6) AS lift,
        |  CASE WHEN conf < 1.0 THEN
        |    round((1.0 - CAST(cb AS DOUBLE) / CAST(nn AS DOUBLE)) /
        |      (1.0 - conf), 6) END AS conviction
        |FROM t ORDER BY round(lift, 6) DESC, antecedent, consequent"""
        .stripMargin,


    // Integer-exact Pareto boundaries: cum*5 <= tot*4 (A),
    // cum*20 <= tot*19 (B).
    "q221_abc_segments" ->
      """WITH sp AS (SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS p
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(sum(p) AS HUGEINT) AS tot FROM sp),
        |w AS (SELECT p,
        |    CAST(sum(p) OVER (ORDER BY p DESC, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum FROM sp),
        |cl AS (SELECT p,
        |    CASE WHEN cum * 5 <= t.tot * 4 THEN 'A'
        |         WHEN cum * 20 <= t.tot * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class, t.tot
        |  FROM w, t)
        |SELECT abc_class, count(*) AS n_customers,
        |  CAST(CAST(sum(p) AS HUGEINT) AS DOUBLE) / 100.0 AS revenue,
        |  round(CAST(CAST(sum(p) AS HUGEINT) AS DOUBLE) /
        |    CAST(max(tot) AS DOUBLE), 6) AS rev_share
        |FROM cl GROUP BY abc_class ORDER BY abc_class""".stripMargin,


    // Exact cent partials; window re-sums stay integral; shares and the
    // rev division are single correctly-rounded IEEE ops on both sides.
    "q215_share_of_parent" ->
      """WITH t AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS p
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |w AS (SELECT r_name, n_name, p,
        |    CAST(sum(p) OVER (PARTITION BY r_name) AS HUGEINT) AS pr,
        |    CAST(sum(p) OVER () AS HUGEINT) AS pt FROM t)
        |SELECT r_name, n_name,
        |  CAST(p AS DOUBLE) / 100.0 AS nation_rev,
        |  round(CAST(p AS DOUBLE) / CAST(pr AS DOUBLE), 6)
        |    AS share_of_region,
        |  round(CAST(p AS DOUBLE) / CAST(pt AS DOUBLE), 6)
        |    AS share_of_total
        |FROM w ORDER BY r_name, n_name""".stripMargin,


    // One lead window builds the pairs; entropy over the bounded
    // (prev, next) type matrix.
    "q214_transition_entropy" ->
      """WITH p AS (SELECT event_type AS prev,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM events),
        |c AS (SELECT prev, next, count(*) AS c FROM p
        |  WHERE next IS NOT NULL GROUP BY prev, next),
        |m AS (SELECT prev, CAST(sum(c) AS BIGINT) AS n_out,
        |    count(*) AS n_next_types FROM c GROUP BY prev)
        |SELECT c.prev AS event_type, m.n_out, m.n_next_types,
        |  round(sum(-(CAST(c.c AS DOUBLE) / CAST(m.n_out AS DOUBLE)) *
        |    ln(CAST(c.c AS DOUBLE) / CAST(m.n_out AS DOUBLE))), 6)
        |    AS entropy
        |FROM c JOIN m ON m.prev = c.prev
        |GROUP BY c.prev, m.n_out, m.n_next_types
        |ORDER BY event_type""".stripMargin,


    // Population variance from exact integer sums; top-10 by |z| with
    // (dow, hour) tiebreak.
    "q209_seasonal_anomaly" ->
      """WITH b AS (SELECT CAST(dayofweek(ts) AS INT) AS dow,
        |    CAST(extract(hour FROM ts) AS INT) AS hour,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS q
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT count(*) AS gn, sum(q) AS gs, sum(q * q) AS gsq
        |  FROM b),
        |k AS (SELECT dow, hour, count(*) AS n, sum(q) AS s
        |  FROM b GROUP BY dow, hour),
        |z AS (SELECT dow, hour, n,
        |    round((CAST(s AS DOUBLE) / 1000000.0) / n, 6) AS mean_value,
        |    round(((CAST(s AS DOUBLE) / 1000000.0) / n -
        |      (CAST(gs AS DOUBLE) / 1000000.0) / CAST(gn AS DOUBLE)) /
        |      sqrt((CAST(CAST(gn AS HUGEINT) * gsq - gs * gs AS DOUBLE) /
        |        (CAST(gn AS DOUBLE) * CAST(gn AS DOUBLE) *
        |          1000000.0 * 1000000.0)) / n), 6) AS z
        |  FROM k, g)
        |SELECT dow, hour, n, mean_value, z FROM z
        |ORDER BY abs(z) DESC, dow, hour LIMIT 10""".stripMargin,


    // First conversion by (ts, event_id); priors strictly before in the
    // same order; both row_numbers share one window sort.
    "q205_attribution" ->
      """WITH conv AS (SELECT user_id,
        |    min(ROW(ts, event_id)) AS fp
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |c2 AS (SELECT user_id, fp[1] AS fpts, fp[2] AS fpid
        |  FROM conv),
        |pri AS (SELECT e.user_id, e.ts, e.event_id, e.event_type
        |  FROM events e JOIN c2 USING (user_id)
        |  WHERE e.event_type <> 'purchase' AND
        |    (e.ts < c2.fpts OR (e.ts = c2.fpts AND e.event_id < c2.fpid))),
        |r AS (SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM pri),
        |f AS (SELECT event_type, count(*) AS first_touch FROM r
        |  WHERE rn = 1 GROUP BY event_type),
        |l AS (SELECT event_type, count(*) AS last_touch FROM r
        |  WHERE rn = n GROUP BY event_type)
        |SELECT coalesce(f.event_type, l.event_type) AS event_type,
        |  coalesce(first_touch, 0) AS first_touch,
        |  coalesce(last_touch, 0) AS last_touch
        |FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
        |ORDER BY event_type""".stripMargin,
  )
}

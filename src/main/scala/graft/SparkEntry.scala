package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables.{load, parallel}
import graft.functions.Timestamps
import graft.functions.TextFunctions
import graft.operators.{CorpusStats, Curation, DataQuality, Dedup, EntityResolution, Graph, IncrementalAgg, Itemsets, Maintenance, Merge, Profiling, Quantization, Relational, Retention, Sessionize, Similarity, TextDedup, TimeSeries}

/** Driver contract (SURVEY.md §7): one `queries` entry per implemented
  * operator, each with equivalent ANSI SQL for the DuckDB oracle.
  *
  * Determinism conventions shared by every query/oracle pair:
  *  - totally ordered output (explicit ORDER BY with tie-breaking keys);
  *  - money/measure aggregations computed per-row in IEEE double (identical
  *    in both engines), cast to exact DECIMAL before SUM (associative, so
  *    order-independent), cast back to DOUBLE for a canonical output type;
  *  - hash-style ops (minhash/simhash/fingerprints) built on md5, which
  *    both engines expose with identical semantics — never on engine-
  *    private hashes like Spark's murmur3 `hash()`.
  */
object SparkEntry {

  /** Total order for a SMALL result built on a shuffle-free expensive
    * projection. A plain `orderBy` range-samples its child, re-executing
    * the whole projection DAG a second time (aggregates/joins are
    * protected because their shuffle stages are reused; projections have
    * no shuffle to reuse). One round-robin shuffle into a single
    * partition + a local sort keeps the projection parallel, runs it
    * once, and yields the same deterministic order. Only for outputs
    * that fit one partition — large sorted outputs should sort the
    * narrow base early instead (see TradeInQueries.rawSpark).
    *
    * Scope note: the totally-ordered OUTPUT itself is a harness
    * artifact (the oracle compare reads rows in order); production
    * jobs at 100 TB do not demand a total order of a fact table, and
    * per-fact-row results there would keep a parallel `orderBy` (or no
    * sort at all). At bench scale every such output is ≤ ~1M narrow
    * rows, where the single-partition sort measurably beats orderBy's
    * extra range-sampling job (q55's three-way A/B, round 6; q14,
    * round 7).
    *
    * That scope is ENFORCED, not advisory: the single-partition form is
    * taken only under the bench/verify harness ([[singlePartitionFinals]]
    * — set by Bench/Prof/Verify mains or `SPARK_GRAFT_BENCH=1`); any
    * other caller gets the parallel range-sort, so a library user can
    * never inherit a single-partition Exchange on a 100 TB final
    * (PlanShapeSpec pins both shapes). */
  private[graft] def ordered1(df: DataFrame, keys: Column*): DataFrame =
    if (singlePartitionFinals) df.repartition(1).sortWithinPartitions(keys: _*)
    else df.orderBy(keys: _*)

  /** [[ordered1]] for WIDE finals: above ~500k emitted rows × ~10
    * columns the single-partition sort's one task serializes the whole
    * materialization and LOSES to the parallel range sort even with its
    * extra sampling job (q161 A/B, round 11: 1.86 s single-task vs
    * 1.36 s range-sorted at 8 shuffle partitions — the only registry
    * query above that threshold). Same output order, different exchange
    * shape; non-harness callers get the identical parallel sort. */
  private[graft] def orderedWide(df: DataFrame, keys: Column*): DataFrame =
    df.orderBy(keys: _*)

  /** Harness flag gating [[ordered1]]'s single-partition final sort.
    * Defaults to the `SPARK_GRAFT_BENCH=1` env (manual runs); the
    * Bench/Prof/Verify mains set it true for their own JVM. @volatile:
    * written once at main() startup, read from query builders. */
  @volatile private[graft] var singlePartitionFinals: Boolean =
    sys.env.get("SPARK_GRAFT_BENCH").contains("1")

  /** Exactly 12 tokens — q84's injected boilerplate span (one full
    * 12-token span, so it aligns with the span grid in both engines). */
  private[graft] val SpanBoiler =
    "please accept cookies to continue reading this page thank you very much"

  /** q91's injected boilerplate line (corpus-frequent by construction,
    * so line dedup must strip every copy). */
  private[graft] val LineBoiler =
    "subscribe to our newsletter for the latest updates"

  private def dec(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))
  /** SUM with exact decimal accumulation, canonical double output.
    *
    * Semantics are identical to `sum(dec(c, scale)).cast("double")` — the
    * per-row quantization is the same decimal cast — but the accumulator
    * is the unscaled BIGINT: a wide-decimal SUM buffer (precision 28 after
    * Spark's +10 widening) is byte-array-backed in UnsafeRow, so every
    * update round-trips through BigDecimal, measured ~1.7× the whole
    * aggregate's cost. Summing the unscaled long hits the codegen'd long
    * adder instead. The final division runs in decimal (not double) so the
    * quotient is exact and only the last cast rounds — sums past 2^53
    * would otherwise double-round through the long→double conversion.
    * Overflow bound: unscaled sums stay exact below 2^63 ≈ 9.2e18, the
    * same order as the decimal(28) widened buffer's 1e28 — either needs a
    * two-level (partial/final) re-aggregation design well before 100 TB of
    * a single skewed group. */
  /** See [[graft.functions.Decimals]] — guarded fast-path quantization +
    * exact final division (the q01 2.7× fix, shared with TimeSeries). */
  private def unscaledLong(c: Column, scale: Int): Column =
    graft.functions.Decimals.unscaledLong(c, scale)
  private def dsum(c: Column, scale: Int): Column =
    graft.functions.Decimals.dsum(c, scale)
  /** Two-level split of [[dsum]] for re-aggregation (rollup/cube over
    * pre-aggregated partials): `dsumPartial` is the per-group unscaled
    * BIGINT sum, `dsumFinal` re-sums partials and applies the one exact
    * decimal division. dsumFinal(dsumPartial) ≡ dsum because long
    * addition is associative. */
  private def dsumPartial(c: Column, scale: Int): Column =
    sum(unscaledLong(c, scale))
  private def dsumFinal(partial: Column, scale: Int): Column =
    graft.functions.Decimals.fromUnscaled(sum(partial), scale)
  private val revenueRow: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  /** Flagship (driver t1 smoke, sf0.001): the reference's core
    * dedup-then-MERGE shape on the corpus. */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_merge_upsert")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ TradeInQueries.queries ++ MediaQueries.queries

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation / scan breadth (SURVEY.md §2.4 generalized) --------
    // NOT parallel()'d: a pre-agg round-robin shuffle of the full fact
    // rows costs more than the single-threaded partial agg it spreads
    // (measured 1.26 s vs 1.14 s at sf0.1) — map-side combine over 6
    // groups is already the minimal-shuffle plan.
    "q01_pricing_summary" -> ((s, d) => {
      load(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(revenueRow, 4).as("sum_disc_price"),
          dsum(revenueRow * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- W1 dedup-latest-per-key (reference rqtradein_etl.py:166-171) ---
    "q02_dedup_latest" -> ((s, d) => {
      Dedup.latestPerKey(load(s, d, "orders"), Seq("o_custkey"),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .transform(ordered1(_, col("o_custkey")))
    }),

    // ---- multi-way joins (SURVEY.md §2.3 generalized) -------------------
    "q03_shipping_priority" -> ((s, d) => {
      val c = load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = load(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(revenueRow, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    }),

    "q04_local_supplier_volume" -> ((s, d) => {
      val r = load(s, d, "region").filter(col("r_name") === "ASIA")
      val n = load(s, d, "nation")
      val c = load(s, d, "customer")
      val su = load(s, d, "supplier")
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = load(s, d, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(revenueRow, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q05_semi_join" -> ((s, d) => {
      Relational.semi(
          load(s, d, "customer").select(col("c_custkey"), col("c_name"), col("c_nationkey")),
          load(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q06_anti_join" -> ((s, d) => {
      Relational.anti(
          load(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")),
          load(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "q07_having" -> ((s, d) => {
      load(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")
    }),

    // NOT parallel()'d: even though the multi-distinct Expand ×2 runs on
    // the single-row-group scan's one thread, a round-robin pre-shuffle
    // of the raw fact rows measured 1.38 s vs 0.80 s — the expand's
    // partial aggregate still collapses ~1.2M expanded rows to ~400k
    // distinct groups before the exchange, and shipping raw rows forfeits
    // that 3× reduction.
    "q08_distinct_agg" -> ((s, d) => {
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // rollup/cube over PRE-AGGREGATED partials, not raw rows: the Expand
    // operator multiplies its input ×(grouping sets), so expanding the
    // full fact table pushes every row through the decimal cast 3-4
    // times. Grouping by the finest cell first collapses the input to
    // |distinct(keys)| rows (~6 here), and rollup/cube of SUM/COUNT over
    // partial sums/counts is algebraically identical — the same trick a
    // materialized-view rewrite applies at 100 TB.
    "q09_rollup" -> ((s, d) => {
      load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("__n"), dsumPartial(col("l_quantity"), 2).as("__q"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          // coalesce: on an EMPTY relation the direct form's grand total
          // is count(1)=0, but sum over zero partial rows is NULL
          coalesce(sum(col("__n")), lit(0L)).as("n"),
          dsumFinal(col("__q"), 2).as("sum_qty"))
        .orderBy(col("g1"), col("g2"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q10_cube" -> ((s, d) => {
      load(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"), dsumPartial(col("o_totalprice"), 2).as("__t"))
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g1"),
          grouping(col("o_orderpriority")).cast("int").as("g2"),
          coalesce(sum(col("__n")), lit(0L)).as("n"),
          dsumFinal(col("__t"), 2).as("total"))
        .orderBy(col("g1"), col("g2"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // ---- set operations (SURVEY.md §2.8 generalized) --------------------
    "q11_setop_intersect" -> ((s, d) => {
      val cn = load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = load(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy("nationkey")
    }),

    "q12_setop_except" -> ((s, d) => {
      val cn = load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = load(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.except(sn).orderBy("nationkey")
    }),

    // ---- global top-k (TakeOrderedAndProject, no full sort) -------------
    "q13_topk" -> ((s, d) => {
      Relational.topK(
        load(s, d, "orders").select(col("o_orderkey"), col("o_totalprice")),
        20, col("o_totalprice").desc, col("o_orderkey").asc)
    }),

    // ---- window frames (SURVEY.md §2.5 generalized) ---------------------
    "q14_window_frames" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      load(s, d, "events")
        .withColumn("running_value",
          graft.functions.Decimals.fromUnscaled(
            sum(unscaledLong(col("value"), 2)).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("rn", row_number().over(w).cast("long"))
        .select("event_id", "user_id", "value", "running_value", "prev_type", "next_type", "rn")
        // ordered1, not orderBy: range-partition sampling re-executes the
        // whole window subtree for boundary estimation
        .transform(ordered1(_, col("user_id"), col("rn")))
    }),

    // ---- event-time tumbling window (streaming-shaped batch, T2) --------
    "q15_time_window" -> ((s, d) => {
      load(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // ---- JSON scalar extraction + typed projection (P3) -----------------
    "q16_json_extract" -> ((s, d) => {
      load(s, d, "events")
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k"),
          dec(col("value"), 2).cast("double").as("value_dec"),
          col("ts").cast("date").as("event_date"))
        .transform(ordered1(_, col("event_id")))
    }),

    // ---- F1/F2/F10: multi-format timestamp parse round-trip. The input
    // string rotates through the reference's accepted shapes by
    // event_id % 4 (T+6-digit-fraction+Z, T+Z, space+3-digit fraction —
    // exercising the pad-to-6 path — and space-plain), so every coalesce
    // fallback and the Z-strip actually run. ------------------------------
    "q17_ts_parse" -> ((s, d) => {
      val m = col("event_id") % 4
      val iso =
        when(m === 0, concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")))
          .when(m === 1, concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z")))
          .when(m === 2, concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss."),
            substring(date_format(col("ts"), "SSSSSS"), 1, 3)))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      load(s, d, "events")
        .select(col("event_id"), iso.as("iso"))
        .select(col("event_id"), col("iso"),
          Timestamps.parseTimestamp(col("iso")).as("parsed"))
        .transform(ordered1(_, col("event_id")))
    }),

    // ---- F3/F5: UTC → America/New_York conversion (seconds precision) ---
    "q18_est_convert" -> ((s, d) => {
      load(s, d, "events")
        .select(col("event_id"),
          Timestamps.toEstString(col("ts")).as("est_str"),
          Timestamps.toEstTimestamp(col("ts")).as("est_ts"))
        .transform(ordered1(_, col("event_id")))
    }),

    // ---- M1: MERGE-upsert emulation (the reference's core query) --------
    "q19_merge_upsert" -> ((s, d) => {
      val cutoverLo = lit("1996-01-01 00:00:00").cast("timestamp")
      val cutoverHi = lit("1997-01-01 00:00:00").cast("timestamp")
      val o = load(s, d, "orders")
      val target = o.filter(col("o_orderdate") < cutoverHi)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val source = o.filter(col("o_orderdate") >= cutoverLo)
        .select(col("o_orderkey"), col("o_custkey"),
          dec(col("o_totalprice") * lit(1.1), 3).cast("double").as("o_totalprice"),
          col("o_orderstatus"))
      Merge.upsert(target, source, "o_orderkey",
          Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
          actionCol = Some("action"))
        .transform(ordered1(_, col("o_orderkey")))
    }),

    // ---- M2: retention filter-retain (delete as its relational dual) ----
    "q20_retention" -> ((s, d) => {
      Retention.retain(load(s, d, "events"),
          col("ts").cast("date") === lit("2024-01-15").cast("date"))
        .select("event_id", "ts", "event_type")
        .transform(ordered1(_, col("event_id")))
    }),

    // ---- A1/A2: predicated counts ---------------------------------------
    "q21_counts_filtered" -> ((s, d) => {
      load(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("value") > 100, lit(1))).as("n_high"))
        .orderBy("event_type")
    }),

    // ---- north-star: text analysis --------------------------------------
    "q22_text_stats" -> ((s, d) => {
      load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          length(col("text")).cast("long").as("text_len"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          size(array_distinct(TextFunctions.tokens(col("text")))).cast("long").as("n_distinct_tokens"),
          TextFunctions.typeTokenRatio(col("text")).as("ttr"))
        .transform(ordered1(_, col("doc_id")))
    }),

    "q23_text_quality" -> ((s, d) => {
      load(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // ---- north-star: dedup family ---------------------------------------
    "q24_dedup_exact" -> ((s, d) => {
      TextDedup.exact(load(s, d, "documents"), "text", "doc_id")
        .select("doc_id", "n_copies", "text")
        .orderBy("doc_id")
    }),

    "q25_minhash_sig" -> ((s, d) => {
      TextDedup.minhashSignatures(parallel(load(s, d, "documents")), "text", "doc_id",
          numHashes = 4, shingleSize = 3)
        .transform(ordered1(_, col("doc_id")))
    }),

    "q26_neardup_jaccard" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.jaccardOnPairs(pairs, docs, "text", "doc_id")
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // The mega-bucket guard's exact semantics, oracle-gated: buckets at
    // or under the cap emit all pairs, wider buckets emit the min-anchored
    // star (see TextDedup.lshCandidatePairs). cap=2 exercises BOTH
    // branches on the real corpus (bucket widths reach 3 at sf0.01, 8 at
    // sf0.1).
    "q67_lsh_guarded" -> ((s, d) => {
      val sigs = TextDedup.minhashSignatures(
        parallel(load(s, d, "documents")), "text", "doc_id", 4, 3)
      TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2, maxBucket = 2)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // No parallel(): simhash hash-repartitions by doc_id itself.
    "q27_simhash" -> ((s, d) => {
      TextDedup.simhash(load(s, d, "documents"), "text", "doc_id", 16)
        .transform(ordered1(_, col("doc_id")))
    }),

    "q28_fingerprint" -> ((s, d) => {
      parallel(load(s, d, "documents"))
        .select(col("doc_id"),
          TextFunctions.exactFingerprint(col("text")).as("fp_exact"),
          TextFunctions.winnowFingerprint(col("text")).as("fp_winnow"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // ---- north-star: similarity search ----------------------------------
    "q29_knn_cosine" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 3)
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // ---- T1/T2 streaming-class window semantics, batch-checkable --------
    // Sliding event-time window (1h window, 30m slide): every event lands
    // in exactly 2 windows. The same groupBy(window(...)) compiles
    // unchanged under readStream + watermark (see graft.streaming).
    "q38_sliding_window" -> ((s, d) => {
      load(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Session window (10m inactivity gap) per user: session end = last
    // event + gap, Spark's session_window semantics.
    "q39_session_window" -> ((s, d) => {
      load(s, d, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    }),

    // LSH-bucketed ANN; oracle embeds the deterministic planes as literals.
    "q30_knn_lsh" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 3,
          planes = Similarity.deterministicPlanes(4, 64))
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // As-of join: each event enriched with the user's most recent order
    // at-or-before the event time (union + ordered window — one shuffle,
    // no range self-join).
    "q43_asof_join" -> ((s, d) => {
      val left = load(s, d, "events")
        .select(col("event_id"), col("user_id").as("k"), col("ts"))
      val right = load(s, d, "orders")
        .select(col("o_custkey").as("k"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      Relational.asofJoin(left, right, "k", "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"), tieBreak = Seq(col("o_orderkey").asc))
        .select(col("event_id"), col("k").as("user_id"), col("ts"),
          col("o_orderkey"), col("o_totalprice"))
        .transform(ordered1(_, col("event_id")))
    }),

    // Pivot: long→wide aggregation with a fixed value list.
    "q44_pivot" -> ((s, d) => {
      load(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          col("1-URGENT").as("p1"), col("2-HIGH").as("p2"),
          col("3-MEDIUM").as("p3"), col("4-NOT SPECIFIED").as("p4"),
          col("5-LOW").as("p5"))
        .orderBy("o_orderstatus")
    }),

    // Exact percentiles by row selection (no interpolation arithmetic —
    // the picked value is a stored double, identical in any engine).
    "q45_percentile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      // Group sizes come from a broadcast-joined pre-aggregation, not a
      // second (unordered) COUNT window: the two window specs have
      // different frames, so Spark would plan two Window operators — the
      // full partition materialized twice. The counts frame is |groups|
      // rows at any scale; the broadcast join costs nothing.
      // SCALE NOTE: a window partitioned by 3 status values caps
      // parallelism at 3 — at 100 TB swap the row_number for
      // Relational.groupedRowNumber (range-partitioned order statistics,
      // unbounded parallelism; proven rank-identical in RelationalSpec).
      // At bench scale the single window is cheaper, so it stays.
      val counts = load(s, d, "orders")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("__n"))
      load(s, d, "orders")
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .withColumn("__rn", row_number().over(w))
        .join(broadcast(counts), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(
          max(when(col("__rn") === ceil(col("__n") * 0.5), col("o_totalprice"))).as("p50"),
          max(when(col("__rn") === ceil(col("__n") * 0.9), col("o_totalprice"))).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Char n-gram Jaccard verification on LSH candidates (dedup family:
    // the tokenization-robust sibling of q26's token Jaccard).
    "q46_ngram_jaccard" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.ngramJaccardOnPairs(pairs, docs, "text", "doc_id", 3)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // Per-group top-k: window-group-limit (no full materialization of the
    // window; each partition keeps only k rows per group during the sort).
    "q47_topk_per_group" -> ((s, d) => {
      Relational.topKPerGroup(
          load(s, d, "orders").select("o_orderstatus", "o_orderkey", "o_totalprice"),
          Seq(col("o_orderstatus")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy("o_orderstatus", "o_orderkey")
    }),

    // Gaps-and-islands sessionization: per-event session ids (the
    // join-back-able form of q39's session_window aggregation).
    "q48_sessionize" -> ((s, d) => {
      Sessionize.sessionStats(load(s, d, "events"), "user_id", "ts",
          gapSeconds = 600, measure = dsum(col("value"), 2),
          tieBreak = Seq(col("event_id")))
        .select(col("user_id"), col("session_id"), col("n"),
          col("s_start"), col("s_last"), col("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    // Deterministic hash sample (~10.2%): reproducible, churn-free
    // train/eval-split-grade sampling, aggregated per stratum.
    "q49_hash_sample" -> ((s, d) => {
      Relational.deterministicSample(
          load(s, d, "orders"), col("o_orderkey"), "1a")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_sampled"), dsum(col("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // SCD Type-2 history: validity intervals per customer from the order
    // change log (history-preserving dual of the reference's MERGE).
    "q50_scd2_history" -> ((s, d) => {
      Merge.scd2History(
          load(s, d, "orders")
            .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
          "o_custkey", "o_orderdate", tieBreak = Seq(col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("effective_from"), col("effective_to"), col("is_current"))
        .transform(ordered1(_, col("o_custkey"), col("effective_from"), col("o_orderkey")))
    }),

    // Repetition quality signals (Gopher/C4-style boilerplate filters).
    // No parallel(): repetitionSignals hash-repartitions by doc_id
    // itself (its one shuffle), which both spreads the single-row-group
    // scan and feeds both aggregation levels.
    "q51_repetition" -> ((s, d) => {
      CorpusStats.repetitionSignals(load(s, d, "documents"),
          "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),

    // Corpus-relative rare-token quality stats (C4/Gopher-style filter
    // input): rare = corpus frequency below the corpus mean, compared in
    // integers (c·V < T) so the oracle is bit-exact.
    "q68_rare_tokens" -> ((s, d) => {
      CorpusStats.rareTokenStats(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),

    // End-to-end dedup: MinHash → LSH candidates → connected components →
    // keep each component's min id — the full removal pass a training
    // corpus actually runs, as ONE oracle-gated query.
    "q69_dedup_corpus" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      val losers = TextDedup.dupClusters(pairs, "doc_id")
        .filter(col("doc_id") =!= col("cluster"))
        .select("doc_id")
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // Stratified deterministic sample: exactly `k` rows per class in
    // md5-of-key order — the per-class train/eval split (q49's hash
    // sample keeps a deterministic FRACTION; this keeps a deterministic
    // COUNT per stratum). Window-group-limit pushes rn<=k into the sort;
    // for low-cardinality strata at 100 TB swap the window for
    // Relational.groupedRowNumber (same rank semantics, unbounded
    // parallelism).
    "q71_stratified_sample" -> ((s, d) => {
      Relational.topKPerGroup(
          load(s, d, "orders").select("o_orderstatus", "o_orderkey", "o_totalprice"),
          Seq(col("o_orderstatus")),
          Seq(md5(col("o_orderkey").cast("string")), col("o_orderkey")), k = 50)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        .transform(ordered1(_, col("o_orderstatus"), col("o_orderkey")))
    }),

    // Composite quality filter (the C4/Gopher-style curation pass a
    // training corpus actually runs): per-row signals + both
    // corpus-relative aggregates joined on doc_id into one keep/drop
    // verdict. Every signal reuses a component already proven
    // hash-identical to DuckDB in its own query (q22/q23/q51/q68), so
    // the composite's double comparisons against literal thresholds are
    // engine-consistent by construction.
    "q70_quality_filter" -> ((s, d) => {
      val docs = load(s, d, "documents")
      val perRow = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.typeTokenRatio(col("text")).as("ttr"),
        TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"))
      val rep = CorpusStats.repetitionSignals(docs, "text", "doc_id")
        .select(col("doc_id"), col("top_bigram_frac"))
      val rare = CorpusStats.rareTokenStats(docs, "text", "doc_id")
        .select(col("doc_id"), col("rare_frac"))
      perRow.join(rep, "doc_id").join(rare, "doc_id")
        .withColumn("keep",
          col("n_tokens") >= 30 && col("ttr") >= 0.35 &&
            col("stopword_ratio") >= 0.03 && col("top_bigram_frac") < 0.08 &&
            col("rare_frac") <= 0.5)
        .orderBy("doc_id")
    }),

    // One-call curation chain ([[graft.operators.Curation.curate]]):
    // exact dedup → near-dup removal → composite quality filter, gated
    // end-to-end with default thresholds. The stages are individually
    // gated as q24/q69/q70; this catches wiring drift between them (the
    // quality panel here is corpus-relative over the NEAR-DEDUPED set,
    // not the raw corpus — exactly the composition q70 alone can't see).
    "q72_curation_chain" -> ((s, d) => {
      Curation.curate(parallel(load(s, d, "documents")), "text", "doc_id")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // Corpus health report: the per-(source, lang) release "corpus card"
    // — volumes, mean quality signals, exact-dup fraction per cell.
    "q78_corpus_report" -> ((s, d) => {
      CorpusStats.corpusReport(parallel(load(s, d, "documents")),
          "text", "source", "lang")
        .orderBy("source", "lang")
    }),

    // Incremental ingest dedup: the daily batch (doc_id % 10 = 0) is
    // signatured and probed against the standing corpus's prebuilt band
    // index — the corpus is never re-signatured; candidates are the
    // batch docs colliding with any corpus doc on an LSH band.
    "q77_incremental_dedup" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val index = TextDedup.buildBandIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "text", "doc_id", numHashes = 4, shingleSize = 3, rowsPerBand = 2)
      TextDedup.incrementalCandidates(docs.filter(col("doc_id") % 10 === 0),
          index, "text", "doc_id", numHashes = 4, shingleSize = 3, rowsPerBand = 2)
        .transform(ordered1(_, col("doc_id_new"), col("doc_id_corpus")))
    }),

    // Domain-mixture weighted sampling: deterministic per-source keep
    // fractions (src0 all, src1 half, src2 quarter, rest 10%) — the
    // corpus-mixing step that hits a target domain distribution.
    "q76_domain_mixture" -> ((s, d) => {
      Relational.weightedSample(load(s, d, "documents"),
          "source", col("doc_id"),
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultFraction = 0.1)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }),

    // Sequence packing: concat-then-chunk pack assignment per 8-way
    // shard with a 256-token context budget — the pretraining batch
    // construction step, as loader metadata (pack id + start offset).
    "q75_sequence_packing" -> ((s, d) => {
      val docs = load(s, d, "documents").select(col("doc_id"),
        (col("doc_id") % 8).as("shard"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Packing
        .packSequences(docs, "doc_id", "n_tokens", "shard", budget = 256L)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_offset"), col("pack_id"))
        .orderBy("doc_id")
    }),

    // Char-level Shannon entropy per document — the model-free gibberish
    // detector in the quality family (q22/q23/q51/q68 siblings).
    "q74_char_entropy" -> ((s, d) => {
      CorpusStats.charEntropy(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),

    // Unigram-LM perplexity proxy (CCNet/Gopher quality family): mean
    // per-token log-prob under the corpus's own add-0.5-smoothed unigram
    // distribution — the "too improbable = noise, too probable =
    // boilerplate" signal that complements q68's rare-token fractions.
    "q79_lm_quality" -> ((s, d) => {
      // no parallel(): the operator's own doc-id repartition is the
      // parallelizing exchange; ordered1 over a 5k-row result replaces
      // orderBy (whose range sampling re-executes the agg subtree)
      CorpusStats.lmLogProb(load(s, d, "documents"), "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),

    // Eval-set decontamination: documents sharing any token 3-gram with
    // the held-out eval slice (doc_id % 20 = 7) are flagged with their
    // distinct-shingle overlap count — the benchmark-overlap gate a
    // training corpus runs before release.
    "q73_decontaminate" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      TextDedup.contaminatedIds(
          docs.filter(col("doc_id") % 20 =!= 7),
          docs.filter(col("doc_id") % 20 === 7),
          "text", "doc_id", shingleSize = 3)
        .orderBy("doc_id")
    }),

    // SimHash Hamming-distance candidate pairs: 32-bit fingerprints cut
    // into 4 8-bit slices (pigeonhole: Hamming < 4 ⇒ some slice agrees,
    // so ≤3 is the complete radius), pairs sharing a slice verified by
    // exact popcount — the fingerprint-space companion to q26's
    // MinHash/LSH banding. 8-bit slices keep slice buckets ~n/256.
    "q80_simhash_pairs" -> ((s, d) => {
      TextDedup.simhashCandidatePairs(
          TextDedup.simhash(parallel(load(s, d, "documents")), "text", "doc_id", 32),
          "doc_id", bits = 32, chunks = 4, maxHamming = 3)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // Per-document TF-IDF top-3 terms: tf·ln(N/df) ranked per doc —
    // keyword extraction for topical mixture analysis.
    "q81_tfidf_topk" -> ((s, d) => {
      CorpusStats.tfIdfTopTerms(load(s, d, "documents"),
          "text", "doc_id", k = 3)
        .transform(ordered1(_, col("doc_id"), col("rank")))
    }),

    // Fixed-context chunking: 64-token windows advancing by 48 (16-token
    // overlap) — the long-document splitting step of pretraining/RAG
    // prep; every token covered, final chunk may run short.
    "q82_doc_chunks" -> ((s, d) => {
      graft.operators.Packing.chunkDocuments(parallel(load(s, d, "documents")),
          "text", "doc_id", window = 64, stride = 48)
        .transform(ordered1(_, col("doc_id"), col("chunk_id")))
    }),

    // Normalization-keyed exact dedup over a deterministically
    // case/punctuation-perturbed fixture (the corpus is already clean,
    // so even docs are uppercased and %3 docs get a punctuation tail —
    // normalizeText must fold both back before grouping). Group size and
    // keeper come from ONE window over md5(norm) — a fixed-width shuffle
    // key, as q78 — instead of an aggregate + rejoin whose second branch
    // re-ran the normalize/md5 scan (partial-agg exchanges are not
    // join-reusable; the q81/q68 lesson).
    "q83_normalize_dedup" -> ((s, d) => {
      val noisy = parallel(load(s, d, "documents")).withColumn("__noisy",
        concat(
          when(col("doc_id") % 2 === 0, upper(col("text"))).otherwise(col("text")),
          when(col("doc_id") % 3 === 0, lit(" ... !!!")).otherwise(lit(""))))
      val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
      noisy.select(col("doc_id"),
          md5(TextFunctions.normalizeText(col("__noisy"))).as("__h"))
        .withColumn("n_copies", count(lit(1)).over(wh))
        .withColumn("__keeper", min(col("doc_id")).over(wh))
        .select(col("doc_id"), col("n_copies"),
          (col("doc_id") === col("__keeper")).cast("int").as("is_keeper"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // C4-style span-level dedup over a boilerplate-injected fixture: every
    // %3 doc gets the same 12-token cookie-notice prefix (the corpus has
    // no natural repeated spans), which span dedup must strip from every
    // carrier but the first while leaving original spans untouched.
    "q84_span_dedup" -> ((s, d) => {
      val noisy = parallel(load(s, d, "documents")).withColumn("__noisy",
        when(col("doc_id") % 3 === 0,
          concat(lit(SpanBoiler + " "), col("text"))).otherwise(col("text")))
      TextDedup.spanDedup(noisy, "__noisy", "doc_id", spanTokens = 12)
        .transform(ordered1(_, col("doc_id")))
    }),

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

    // Domain-mixture budget plan: 50% token budget, no source above 4% of
    // it — the per-source allocation and keep-ratio spec that
    // q76_domain_mixture's weighted sampler would then materialize.
    "q86_token_budget" -> ((s, d) => {
      CorpusStats.mixturePlan(parallel(load(s, d, "documents")),
          "text", "source", budgetPpm = 500000L, maxSourcePpm = 40000L)
        .transform(ordered1(_, col("source")))
    }),

    // Join-key skew audit on the order lines' key — per-key load, share,
    // ratio-to-mean, and the salt factor a salted join would need.
    "q87_skew_audit" -> ((s, d) => {
      Relational.skewAudit(load(s, d, "lineitem"), col("l_orderkey"), topK = 25)
    }),

    // Corpus bigram collocations with PMI (Church & Hanks '90): high
    // count + low PMI = templated boilerplate, high PMI = real phrases.
    "q88_collocations" -> ((s, d) => {
      CorpusStats.collocations(parallel(load(s, d, "documents")),
          "text", "doc_id", topK = 50)
    }),

    // Cross-source 3-gram overlap matrix — the between-domain
    // contamination/syndication audit of a corpus card.
    "q89_source_overlap" -> ((s, d) => {
      TextDedup.sourceOverlap(parallel(load(s, d, "documents")),
          "text", "source", shingleSize = 3)
        .transform(ordered1(_, col("source_a"), col("source_b")))
    }),

    // Per-source token-length deciles as exact order statistics (the q45
    // rank-selection construction — no float interpolation).
    "q90_length_deciles" -> ((s, d) => {
      CorpusStats.lengthDeciles(parallel(load(s, d, "documents")),
          "text", "doc_id", "source")
        .transform(ordered1(_, col("source")))
    }),

    // CCNet-style line-level dedup over a line-structured fixture: each
    // doc splits into a 10-token head line + tail line, and every %4 doc
    // carries a shared boilerplate line that line dedup must strip
    // (corpus-frequent) while body lines survive (doc-frequency <= 5
    // tolerates the corpus's natural exact-dup families).
    "q91_line_dedup" -> ((s, d) => {
      val toks = split(col("text"), " ", -1)
      val lined = parallel(load(s, d, "documents")).withColumn("__lined",
        concat(
          concat_ws("\n",
            array_join(slice(toks, 1, 10), " "),
            array_join(slice(toks, 11, 1000000), " ")),
          when(col("doc_id") % 4 === 0, lit("\n" + LineBoiler)).otherwise(lit(""))))
      TextDedup.lineDedup(lined, "__lined", "doc_id", "\n", maxDocs = 5L)
        .transform(ordered1(_, col("doc_id")))
    }),

    // Embedding-table health panel: per-label counts, dim spread, zero
    // vectors, exact-decimal mean L2 norm.
    "q92_embedding_audit" -> ((s, d) => {
      Similarity.embeddingAudit(parallel(load(s, d, "embeddings")),
          "embedding", "vec_id", "label")
        .transform(ordered1(_, col("label")))
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

    // Ordered view→click→purchase funnel, 7-day window anchored at the
    // first view: earliest-qualifying chain semantics per user.
    "q94_funnel" -> ((s, d) => {
      Sessionize.funnel(parallel(load(s, d, "events")), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowSeconds = 7L * 86400L)
        .transform(ordered1(_, col("step")))
    }),

    // Any-order funnel — q94's unordered complement on the same steps;
    // the ordered/unordered gap measures how real the prescribed order is.
    "q128_funnel_anyorder" -> ((s, d) => {
      Sessionize.funnelAnyOrder(load(s, d, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowSeconds = 7L * 86400L)
        .transform(ordered1(_, col("step")))
    }),

    // Weekly cohort retention matrix (first-seen week × activity offset).
    "q95_cohort_retention" -> ((s, d) => {
      Sessionize.cohortRetention(parallel(load(s, d, "events")),
          "user_id", "ts")
        .transform(ordered1(_, col("cohort_week"), col("week_offset")))
    }),

    // Winnowing (MOSS) fingerprints: 3-gram hashes, window-4 minima.
    "q96_winnowing" -> ((s, d) => {
      TextDedup.winnow(parallel(load(s, d, "documents")),
          "text", "doc_id", k = 3, w = 4)
        .transform(ordered1(_, col("doc_id"), col("fingerprint")))
    }),

    // Per-document 3-gram novelty vs all lower-id documents — the
    // crawl-saturation curve, computed exactly.
    "q97_ngram_novelty" -> ((s, d) => {
      CorpusStats.ngramNovelty(parallel(load(s, d, "documents")),
          "text", "doc_id", n = 3)
        .transform(ordered1(_, col("doc_id")))
    }),

    // Robust per-source length outliers: exact median + MAD fences.
    "q98_length_outliers" -> ((s, d) => {
      CorpusStats.lengthOutliers(parallel(load(s, d, "documents")),
          "text", "doc_id", "source", cutoff = 3.0)
        .transform(ordered1(_, col("source")))
    }),

    // Training-shard balance audit: md5-routed 8-way sharding weighted
    // by token count.
    "q99_shard_audit" -> ((s, d) => {
      Relational.shardAudit(parallel(load(s, d, "documents")),
          col("doc_id"), TextFunctions.tokenCount(col("text")), numShards = 8)
        .transform(ordered1(_, col("shard")))
    }),

    // IVF cell-balance audit: population share + mean centroid cosine
    // per coarse cell (first-10-vectors centroids, the q41 convention).
    "q100_cell_balance" -> ((s, d) => {
      Similarity.cellBalance(parallel(load(s, d, "embeddings")),
          "embedding", "vec_id", nlist = 10)
        .transform(ordered1(_, col("cell")))
    }),

    // q73's Bloom-prefiltered form: SAME fixture, SAME oracle, SAME
    // answer — the sketch (built and probed with Spark's own
    // runtime-filter expressions via graft_bloom_agg/graft_might_contain)
    // only pre-filters the train shingles before the exact-verify join,
    // so correctness is pinned to the exact oracle while the plan is the
    // one that survives an eval set too big to broadcast.
    "q101_decontaminate_bloom" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      TextDedup.contaminatedIdsBloom(
          docs.filter(col("doc_id") % 20 =!= 7),
          docs.filter(col("doc_id") % 20 === 7),
          "text", "doc_id", shingleSize = 3, expectedEvalShingles = 100000L)
        .orderBy("doc_id")
    }),

    // Leave-one-out kNN label-agreement audit over the first 50 vectors:
    // the label-noise panel (per-label neighbor-majority agreement).
    "q104_label_agreement" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      Similarity.knnLabelAgreement(emb, emb.filter(col("vec_id") < 50),
          "embedding", "vec_id", "label", k = 5)
        .transform(ordered1(_, col("label")))
    }),

    // Funnel step latency: integer-second gaps between consecutive
    // first-occurrence steps, with the exact histogram lower-median.
    "q117_funnel_latency" -> ((s, d) => {
      Sessionize.funnelLatency(load(s, d, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .transform(ordered1(_, col("step_from")))
    }),

    // Windowed co-occurrence PPMI (±3 tokens, unordered pairs) — the
    // count matrix behind PPMI word vectors; q88's skip-gram
    // generalization from one explode + one collapsed count table.
    "q118_cooc_ppmi" -> ((s, d) => {
      CorpusStats.cooccurrencePmi(parallel(load(s, d, "documents")),
          "text", window = 3, topK = 50)
    }),

    // Deterministic token-weighted sample (Efraimidis–Spirakis A-ES over
    // hash-derived uniforms): the reproducible first step of token-
    // budgeted corpus assembly — re-runs and the oracle pick the same docs.
    "q119_weighted_sample" -> ((s, d) => {
      val docs = load(s, d, "documents")
      Curation.weightedSample(docs, col("doc_id"),
          TextFunctions.tokenCount(col("text")), n = 100)
    }),

    // Unicode NFC hygiene audit over a fixture that appends a combining-
    // sequence suffix to every doc_id % 7 == 0 doc — non-NFC text hashes
    // apart from its composed twin, so dedup needs this gate first.
    "q120_nfc_audit" -> ((s, d) => {
      val fx = load(s, d, "documents").withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" cafe\u0301"))).otherwise(col("text")))
      CorpusStats.normalizationAudit(fx, "text", "source")
        .transform(ordered1(_, col("source")))
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
    // association mining's support table, exchange-reused self-join.
    "q123_copurchase" -> ((s, d) => {
      Itemsets.coOccurrencePairs(load(s, d, "lineitem"),
          "l_orderkey", "l_partkey", topK = 50)
        .select(col("item_a").as("part_a"), col("item_b").as("part_b"),
          col("n_groups").as("n_orders"))
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

    // Entry-point conversion: per session entry type, how many sessions
    // contained a purchase — sessionization consumed INSIDE a pipeline.
    "q127_entry_conversion" -> ((s, d) => {
      Sessionize.entryConversion(load(s, d, "events"), "user_id", "ts",
          "event_type", target = "purchase", gapSeconds = 600L,
          tieBreak = Seq(col("event_id")))
        .transform(ordered1(_, col("entry_type")))
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

    // Per-label centroid cohesion + nearest-other-centroid separation —
    // the class-taxonomy audit (which labels to merge, which to split).
    "q113_label_separation" -> ((s, d) => {
      Similarity.labelSeparation(load(s, d, "embeddings"),
          "embedding", "vec_id", "label")
        .transform(ordered1(_, col("label")))
    }),

    // Per-source unigram KL divergence from the pooled corpus — the
    // mixture-audit panel (register/language drift, template spam,
    // near-copy "independent" sources all read off it).
    "q103_source_divergence" -> ((s, d) => {
      CorpusStats.sourceDivergence(parallel(load(s, d, "documents")),
          "text", "source")
        .transform(ordered1(_, col("source")))
    }),

    // Per-source OOV rate under a corpus-count≥5 threshold vocabulary —
    // the tokenizer-coverage audit (one collapsed count table + token-
    // marginal window; no vocab join).
    "q105_oov_rate" -> ((s, d) => {
      CorpusStats.oovRate(parallel(load(s, d, "documents")),
          "text", "source", minCount = 5L)
        .transform(ordered1(_, col("source")))
    }),

    // Deterministic 90/5/5 train/val/test split by multiplicative id
    // hash, audited per (source, split): doc counts, token budget, and
    // each split's share of its source.
    "q107_stratified_split" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
      Curation.splitAssign(parallel(load(s, d, "documents")), "doc_id")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .withColumn("doc_share", round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(w).cast("double"), 6))
        .transform(ordered1(_, col("source"), col("split")))
    }),

    // Gopher-rule quality gate pass rates per source (word-count band,
    // mean-word-length band, ≥2 distinct stopwords).
    "q108_gopher_rules" -> ((s, d) => {
      CorpusStats.qualityRules(parallel(load(s, d, "documents")),
          "text", "source")
        .transform(ordered1(_, col("source")))
    }),

    // Token-shingle containment over the q26 LSH candidate pairs — the
    // subset-duplicate detector (short doc embedded in a long one scores
    // low Jaccard but containment ≈ 1 on the short side).
    "q109_containment" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.containmentOnPairs(pairs, docs, "text", "doc_id", n = 3)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // Vocabulary coverage curve at 50% / 90% / 99% of the token stream —
    // count-of-counts histogram, integer-exact threshold cut.
    "q110_zipf_coverage" -> ((s, d) => {
      CorpusStats.zipfCoverage(parallel(load(s, d, "documents")),
          "text", thresholdsPpm = Seq(500000L, 900000L, 990000L))
        .transform(ordered1(_, col("threshold_ppm")))
    }),

    // Cross-split near-dup leakage: LSH candidate pairs whose endpoints
    // land in different q107 splits (near-dup test/train leakage — the
    // reason dedup must run before, or be aware of, the split). Each
    // endpoint's split is computed IN PLACE from the id arithmetic
    // (Curation.splitFor) — no join against an assignment table.
    "q111_split_leakage" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      val sa = Curation.splitFor(col("doc_id_a"))
      val sb = Curation.splitFor(col("doc_id_b"))
      pairs
        .groupBy(least(sa, sb).as("split_lo"), greatest(sa, sb).as("split_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("is_leak", col("split_lo") =!= col("split_hi"))
        .transform(ordered1(_, col("split_lo"), col("split_hi")))
    }),

    // Near-dup removal impact per source: documents losing the q54
    // cluster election (cluster keeper = min id), with doc and token
    // removal rates — the dedup scorecard a release card quotes.
    "q112_dedup_impact" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      // losers: bounded by the candidate-pair population (tiny vs the
      // corpus), so AQE broadcasts the join side at every scale where
      // near-dups are rare; no forced broadcast (a 50%-duplicate crawl
      // would overflow it).
      val losers = TextDedup.dupClusters(pairs, "doc_id")
        .filter(col("doc_id") =!= col("cluster"))
        .select(col("doc_id"), lit(1L).as("__dup"))
      docs
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
        .join(losers, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("__dup").isNotNull, col("__nt")).otherwise(0L))
            .as("tokens_removed"),
          round(sum(when(col("__dup").isNotNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6)
            .as("removal_rate"))
        .transform(ordered1(_, col("source")))
    }),

    // Levenshtein verification over the q26 LSH candidate pairs: the
    // tokenization-free near-dup check (first-200-chars prefix cap — the
    // per-pair O(prefix²) scale contract documented on the operator).
    "q102_edit_verify" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.editDistanceOnPairs(pairs, docs, "text", "doc_id", prefixChars = 200)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // PII scrub over a deterministically PII-injected fixture (the corpus
    // itself is clean, so each row gets a synthetic email+phone suffix
    // built identically by the oracle).
    "q52_pii_scrub" -> ((s, d) => {
      parallel(load(s, d, "documents"))
        .withColumn("__pii", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-4242")))
        .select(col("doc_id"),
          TextFunctions.scrubPii(col("__pii")).as("scrubbed"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // Corpus vocabulary: explode → partial-agg-collapsed count → top-k.
    "q53_vocab" -> ((s, d) => {
      CorpusStats.vocabulary(load(s, d, "documents"), "text", "doc_id",
          minCount = 5, topK = 100)
    }),

    // Schema-full JSON parse: from_json with a declared struct — the
    // idiomatic Spark path for typed JSON columns (q16's regexp extract
    // is the schema-less fallback). Aggregated so the parse feeds a
    // typed computation, not just a projection.
    "q66_from_json" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      // NOT parallel()'d: spreading the parse measured even (0.42-0.48 s
      // both ways at sf0.1) — the round-robin shuffle of the json strings
      // costs what the parallel from_json saves at this payload size.
      load(s, d, "events")
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          max(col("k")).cast("int").as("max_k"))
        .orderBy("event_type")
    }),

    // F8 date arithmetic panel (the reference's window-bound math,
    // __init__.py:12-20, generalized): offsets, clamped month adds,
    // month bounds, day diffs.
    "q65_date_arith" -> ((s, d) => {
      val day = col("o_orderdate").cast("date")
      load(s, d, "orders")
        .filter(col("o_orderkey") <= 30000)
        .select(col("o_orderkey"),
          day.as("day"),
          date_add(day, 30).as("plus_30"),
          date_sub(day, 30).as("minus_30"),
          add_months(day, 1).as("next_month_clamped"),
          last_day(day).as("month_end"),
          trunc(day, "month").as("month_start"),
          datediff(day, lit("1992-01-01").cast("date")).cast("long").as("days_since"))
        .transform(ordered1(_, col("o_orderkey")))
    }),

    // Incremental aggregate maintenance: two disjoint daily partials
    // merged must equal the direct aggregate over everything — the
    // correctness law of incremental rollups, checked by the oracle
    // aggregating the full table directly. Measures summed as exact
    // cents (see dsum).
    "q64_incremental_agg" -> ((s, d) => {
      val ev = load(s, d, "events")
        .withColumn("__cents", dec(col("value"), 2) * 100)
      val odd = ev.filter(col("event_id") % 2 === 1)
      val even = ev.filter(col("event_id") % 2 === 0)
      val parts = Seq(odd, even).map(b =>
        IncrementalAgg.partial(b, Seq("event_type"), "__cents"))
      IncrementalAgg.mergePartials(parts, Seq("event_type"))
        .select(col("event_type"), col("n"),
          (col("sum_m").cast(DecimalType(38, 0)) / 100).cast("double").as("sum_value"),
          (col("min_m") / 100).cast("double").as("min_value"),
          (col("max_m") / 100).cast("double").as("max_value"))
        .orderBy("event_type")
    }),

    // Distribution windows: ntile buckets + exact rank fractions. Both
    // engines compute (rank-1)/(n-1) and rank/n in IEEE double, so the
    // values hash-compare bit-for-bit.
    "q62_rank_distributions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      load(s, d, "orders")
        .filter(col("o_orderkey") <= 30000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).cast("int").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .transform(ordered1(_, col("o_orderkey")))
    }),

    // Scalar string-function panel (the reference's T-SQL string surface
    // generalized): case, padding, translation, position, edit distance.
    "q63_string_panel" -> ((s, d) => {
      parallel(load(s, d, "documents"))
        .select(col("doc_id"),
          concat(upper(substring(col("text"), 1, 1)),
            lower(substring(col("text"), 2, 11))).as("title_head"),
          translate(substring(col("text"), 1, 20), "aeiou", "_____").as("devoweled"),
          instr(col("text"), "the").cast("long").as("first_the"),
          lpad(col("doc_id").cast("string"), 8, "0").as("padded_id"),
          levenshtein(substring(col("text"), 1, 15),
            reverse(substring(col("text"), 1, 15))).cast("long").as("palindromicity"))
        .transform(ordered1(_, col("doc_id")))
    }),

    // Unpivot/melt — the inverse of q44's pivot: wide measure columns to
    // (measure, value) rows. Pure per-row expansion, no shuffle.
    "q60_unpivot" -> ((s, d) => {
      load(s, d, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .transform(ordered1(_, col("l_orderkey"), col("l_linenumber"), col("measure")))
    }),

    // Nested reshaping: per-user sorted distinct event-type set —
    // collect_set is order-nondeterministic, sort_array canonicalizes,
    // and concat_ws flattens to a scalar so any downstream consumer
    // (including the oracle harness, which cannot hash array cells)
    // compares it as a plain string.
    "q61_nested_collect" -> ((s, d) => {
      load(s, d, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws("|", sort_array(collect_set(col("event_type")))).as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    // GROUPING SETS (the asymmetric sibling of cube/rollup) — only
    // expressible through the SQL surface; exercises spark.sql over
    // registered corpus views.
    "q58_grouping_sets" -> ((s, d) => {
      load(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g1,
               CAST(grouping(o_orderpriority) AS INT) AS g2,
               count(1) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }),

    // Correlated EXISTS subquery (decorrelates to a left-semi join —
    // same physical plan as q05, reached through the SQL analyzer).
    "q59_exists_subquery" -> ((s, d) => {
      load(s, d, "customer").createOrReplaceTempView("customer_v")
      load(s, d, "orders").createOrReplaceTempView("orders_v2")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v2 o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")
    }),

    // Interval (range) join via bucketization: events matched back to
    // their session's [start, last] interval — each event lands in
    // exactly one interval, so the join must produce |events| rows.
    "q55_interval_join" -> ((s, d) => {
      val ev = load(s, d, "events")
      val sessions = Sessionize.sessionStats(ev, "user_id", "ts",
          gapSeconds = 600, measure = count(lit(1)).as("__m"),
          tieBreak = Seq(col("event_id")))
        .select(col("user_id"), col("s_start"), col("s_last"))
      Relational.intervalJoin(
          ev.select("event_id", "user_id", "ts"), sessions,
          "user_id", "ts", "s_start", "s_last", bucketSeconds = 600)
        .select("event_id", "user_id", "ts", "s_start", "s_last")
        .transform(ordered1(_, col("event_id")))
    }),

    // Dup-cluster assignment: connected components over LSH candidate
    // pairs — transitive chains collapse to one keeper (min id).
    "q54_dup_clusters" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.dupClusters(pairs, "doc_id")
        .withColumn("is_keeper", col("doc_id") === col("cluster"))
        .orderBy("doc_id")
    }),

    // F11: JSON serialization of a record sample (the reference's
    // json.dumps log sample, rqtradein_etl.py:219). String/int fields
    // only — double rendering differs across engines.
    "q42_json_sample" -> ((s, d) => {
      load(s, d, "events")
        .orderBy("event_id").limit(5)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"), col("user_id")))
            .as("js"))
    }),

    // Embedding-cosine near-dup pairs: LSH-bucketed candidates + threshold.
    "q40_embedding_neardup" -> ((s, d) => {
      Similarity.neardupPairs(load(s, d, "embeddings"), "embedding", "vec_id",
          planes = Similarity.deterministicPlanes(4, 64), threshold = 0.3)
        .transform(ordered1(_, col("vec_id_a"), col("vec_id_b")))
    }),

    // IVF-style ANN: coarse-quantized cells, nProbe-cell exact search.
    "q41_knn_ivf" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 3, nlist = 8, nProbe = 2)
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // Hard-negative mining: per query the top-k highest-cosine
    // neighbors INSIDE the confusable band [0.0, 0.9) — the band filter
    // runs before the ranking so near-duplicates can't crowd out the
    // negatives a contrastive loss actually needs. Same IVF probe shape
    // as q41.
    "q145_hard_negatives" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      Similarity.hardNegatives(
          Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8),
          emb.filter(col("vec_id") < 5), "embedding", "vec_id",
          k = 3, nProbe = 2, negHi = 0.9, negLo = 0.0)
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // Int8 scalar quantization quality gate: per-label reconstruction
    // audit (range / MSE / cosine-to-reconstruction) for the 4× embedding
    // storage cut. One scan, one hash agg, exact decimal means.
    "q146_int8_quantize" -> ((s, d) => {
      Quantization.int8Audit(load(s, d, "embeddings"),
          "embedding", "vec_id", "label")
        .transform(ordered1(_, col("label")))
    }),

    // Product-quantization encode + distortion audit: 4 subspaces × 8
    // first-N centroids (the q41 convention), corpus assigned map-side
    // against the broadcast codebook, per-cell population and mean
    // squared distortion.
    "q147_pq_codes" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val cb = Quantization.pqCodebook(emb, "embedding", "vec_id",
        m = 4, ksub = 8)
      Quantization.pqDistortion(
          Quantization.pqAssign(emb, "embedding", "vec_id", cb, m = 4))
        .transform(ordered1(_, col("subspace"), col("code")))
    }),

    // Incremental IVF maintenance: build on the 4/5 base slice (its
    // first-8 vectors as frozen centroids), append the held-out 1/5
    // without re-assigning the base, audit per-cell base/appended
    // populations. Equals a fresh full build by construction (per-row
    // assignment against identical centroids).
    "q148_ivf_append" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val idx = Similarity.buildIvfIndex(base, "embedding", "vec_id",
        nlist = 10)
      val appended = Similarity.ivfAppend(idx,
        emb.filter(pmod(col("vec_id"), lit(5)) === 0), "embedding", "vec_id")
      appended.entries
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(pmod(col("id"), lit(5)) === 0, 1L).otherwise(0L))
            .as("n_appended"))
        .transform(ordered1(_, col("cell")))
    }),

    // Asymmetric-distance (ADC) top-k over the PQ codes: queries stay
    // full-precision, corpus is never decompressed — each code row costs
    // a broadcast-table lookup, per-subspace components decimal-summed.
    "q149_pq_adc" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val cb = Quantization.pqCodebook(emb, "embedding", "vec_id",
        m = 4, ksub = 8)
      val codes = Quantization.pqAssign(emb, "embedding", "vec_id", cb, m = 4)
        .select(col("id"), col("subspace"), col("code"))
      Quantization.pqSearchAdc(codes, cb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", m = 4, k = 3)
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // Lloyd-refined PQ codebook (1 iteration): all 4 subspaces train in
    // the same two jobs — deterministic rounded-argmin assignment +
    // exact-decimal per-position means — then the refined codebook's
    // distortion audit. The oracle replays the full refinement.
    "q150_pq_refined" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val cb = Quantization.pqCodebookRefined(emb, "embedding", "vec_id",
        m = 4, ksub = 8, iterations = 1)
      Quantization.pqDistortion(
          Quantization.pqAssign(emb, "embedding", "vec_id", cb, m = 4))
        .transform(ordered1(_, col("subspace"), col("code")))
    }),

    // Compression-loss recall gate: ADC-over-PQ-codes top-10 vs the
    // exact squared-L2 baseline (like-for-like metric) — the number that
    // decides whether 4-byte codes may replace 256-byte vectors.
    "q151_pq_recall" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val cb = Quantization.pqCodebook(emb, "embedding", "vec_id",
        m = 4, ksub = 8)
      val codes = Quantization.pqAssign(emb, "embedding", "vec_id", cb, m = 4)
        .select(col("id"), col("subspace"), col("code"))
      Similarity.recallAtK(
          Similarity.bruteForceL2TopK(emb, queries, "embedding", "vec_id",
            k = 10),
          Quantization.pqSearchAdc(codes, cb, queries, "embedding", "vec_id",
            m = 4, k = 10),
          "query_id", "neighbor_id")
        .transform(ordered1(_, col("query_id")))
    }),

    // T5-style span corruption: deterministic hash-chosen spans masked
    // with <extra_id_k> sentinels, (input, target) denoising pairs
    // regenerable from the recipe on any engine.
    "q152_span_corruption" -> ((s, d) => {
      graft.operators.Packing.spanCorruption(parallel(load(s, d, "documents")),
          "text", "doc_id", spanLen = 3, corruptEvery = 5)
        .transform(ordered1(_, col("doc_id")))
    }),

    // Inverse-cloze retrieval pairs: first-half anchor / second-half
    // positive, in-batch negative = next-by-md5 within the doc's hash
    // bucket (64-way parallel windows, no global sort).
    "q157_ict_pairs" -> ((s, d) => {
      graft.operators.Packing.ictPairs(parallel(load(s, d, "documents")),
          "text", "doc_id", numBuckets = 64)
        .transform(ordered1(_, col("doc_id")))
    }),

    // Skip-gram (center, context, offset) pair counts over per-user
    // event sequences — word2vec/item2vec training-pair generation.
    "q158_skipgram" -> ((s, d) => {
      Sessionize.skipgramPairs(load(s, d, "events"),
          "user_id", "ts", "event_type", tiebreakCol = "event_id", window = 2)
        .transform(ordered1(_, col("center"), col("context"), col("rel_pos")))
    }),

    // Exact set-similarity self-join (AllPairs/PPJoin prefix filter):
    // every doc pair with 3-gram-shingle Jaccard >= 0.5, no false
    // negatives — the exact counterpart to the MinHash/LSH pipeline.
    // Candidates come only from rare-first prefix shingles + the length
    // filter; verification touches candidate pairs alone.
    "q159_similarity_join" -> ((s, d) => {
      TextDedup.similarityJoin(parallel(load(s, d, "documents")),
          "text", "doc_id", tau = 0.5, shingleSize = 3,
          numPartitions = Some(s.sparkContext.defaultParallelism))
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),


    // Leave-one-out target encoding with additive smoothing: each order's
    // priority encoded as the mean total price of all OTHER orders in
    // that priority, shrunk toward the global mean — the leakage-safe
    // categorical feature. Fit = |categories|-row + 1-row broadcast aggs;
    // the per-row pass never shuffles.
    "q160_target_encode" -> ((s, d) => {
      graft.operators.Features.looTargetEncode(parallel(load(s, d, "orders")),
          "o_orderkey", "o_orderpriority", "o_totalprice",
          scale = 2, smoothing = 10.0)
        .transform(ordered1(_, col("o_orderkey")))
    }),

    // Fit/transform feature scaling: z-score + min-max per numeric
    // column from ONE 1-row exact-moment aggregation broadcast back over
    // the table — the standard two-pass scaler at corpus scale.
    "q161_feature_scale" -> ((s, d) => {
      graft.operators.Features.standardize(parallel(load(s, d, "lineitem")),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_extendedprice", "l_discount"), scale = 2)
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
        // the sort must be total over the emitted columns or ties land in
        // engine-dependent order.
        .transform(orderedWide(_, col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice_z"), col("l_quantity_z"), col("l_discount_z"),
          col("l_extendedprice_mm"), col("l_quantity_mm"), col("l_discount_mm")))
    }),

    // Content-addressed corpus manifest: per-shard doc/byte counts and an
    // order-independent additive digest over every (id, content) md5 —
    // the reproducibility gate between corpus versions. Bounded state
    // (4 word sums/shard), incremental by construction.
    "q162_corpus_manifest" -> ((s, d) => {
      Maintenance.corpusManifest(parallel(load(s, d, "documents")),
          "doc_id", "text", numShards = 8)
        .transform(ordered1(_, col("shard")))
    }),

    // Deterministic negative sampling: k hash-drawn item candidates per
    // user minus the user's observed positives — contrastive-training
    // negatives reproducible across runs (md5 of (user, draw), no RNG).
    "q163_negative_sampling" -> ((s, d) => {
      val pos = load(s, d, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderkey"))
        .join(load(s, d, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_partkey").as("item")), "o_orderkey")
        .select(col("user_id"), col("item")).distinct()
      Curation.negativeSample(pos, "user_id", "item",
          load(s, d, "part").select(col("p_partkey").as("item")), k = 8)
        .transform(ordered1(_, col("user_id"), col("neg_item")))
    }),

    // Temporal train/holdout split at the exact-rank 75% time cutoff +
    // audit (counts, entity coverage, cold-start population) — the
    // leakage-safe split for time-ordered data; rank via range-
    // partitioned order statistics, never a single-task global window.
    "q164_time_split" -> ((s, d) => {
      Curation.temporalSplit(load(s, d, "events"), "user_id", "ts",
          trainFrac = 0.75)
        .transform(ordered1(_, col("split")))
    }),

    // Johnson-Lindenstrauss random projection (64 → 16 dims, Rademacher
    // signs) + pairwise cosine-distortion audit — the training-free
    // embedding-compression lever; projection is dOut codegen'd dot
    // folds against literal sign arrays, shuffle-free.
    "q165_jl_projection" -> ((s, d) => {
      import graft.functions.VectorFunctions.{asDouble, dot, norm}
      val signs = Quantization.projectionSigns(64, 16)
      val base = load(s, d, "embeddings").filter(col("vec_id") < 40)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val proj = Quantization.randomProject(base, "v", signs, "p")
        .withColumn("nv", norm(col("v")))
        .withColumn("np", norm(col("p")))
      val a = proj.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("p").as("pa"), col("nv").as("nva"), col("np").as("npa"))
      val b = proj.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("p").as("pb"), col("nv").as("nvb"), col("np").as("npb"))
      val cosO = dot(col("va"), col("vb")) / (col("nva") * col("nvb"))
      val cosP = dot(col("pa"), col("pb")) / (col("npa") * col("npb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(cosO, 6).as("cos_orig"), round(cosP, 6).as("cos_proj"),
          round(abs(cosO - cosP), 6).as("abs_err"))
        .transform(ordered1(_, col("id_a"), col("id_b")))
    }),

    // Per-source quota capping: at most 15 docs per source by token-count
    // priority — the "no more than N of X" corpus-assembly primitive a
    // fraction-based mixture can't express. rank<=cap compiles to
    // WindowGroupLimit (per-task cap-sized heaps).
    "q166_source_quota" -> ((s, d) => {
      Curation.groupQuota(parallel(load(s, d, "documents")),
          col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")), cap = 15)
        .transform(ordered1(_, col("group"), col("rank")))
    }),

    // Cross-source quantile normalization: each doc's token count mapped
    // to the POOLED distribution's value at the doc's within-source
    // relative rank — batch-effect correction before one global
    // threshold. Both rank passes are range-partitioned order statistics.
    "q167_quantile_norm" -> ((s, d) => {
      Curation.quantileNormalize(
          parallel(load(s, d, "documents"))
            .withColumn("tokens",
              TextFunctions.tokenCount(col("text")).cast("double")),
          "doc_id", "source", "tokens")
        .transform(ordered1(_, col("doc_id")))
    }),

    // LSH banding S-curve planner for 128 hashes: collision probability
    // per (rows, bands, similarity) plus each config's inflection
    // threshold — how the MinHash stack's parameters get chosen.
    "q168_lsh_planner" -> ((s, d) => {
      TextDedup.lshPlan(s, numHashes = 128)
        .transform(ordered1(_, col("r"), col("s")))
    }),

    // Exact binary AUC (Mann-Whitney midranks, integer-exact to the last
    // division): score = first embedding component rounded to 2dp (real
    // tie groups exercise the midrank path), label = class >= 5. Rows
    // collapse to the bounded distinct-score domain before any window.
    "q169_auc_eval" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.aucBinary(emb,
        round(element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1), 2),
        (col("label") >= 5).cast("int"))
    }),

    // Precision/recall at every distinct score threshold — the operating-
    // point table for calibrating a quality filter. Same bounded-domain
    // reduction as q169.
    "q170_pr_curve" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.prCurve(emb,
          round(element_at(graft.functions.VectorFunctions
            .asDouble(col("embedding")), 1), 2),
          (col("label") >= 5).cast("int"))
        .transform(ordered1(_, col("threshold")))
    }),

    // Calibration reliability table: 10 equal-width probability bins with
    // exact confidence sums (decimal-quantized), observed positive rate,
    // |acc-conf| gap, and per-bin ECE contributions.
    "q171_calibration" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val prob = round((element_at(graft.functions.VectorFunctions
        .asDouble(col("embedding")), 1) + lit(1.0)) / lit(2.0), 2)
      graft.operators.Evaluation.calibration(emb, prob,
          (col("label") >= 5).cast("int"), bins = 10, scale = 2)
        .transform(ordered1(_, col("bin")))
    }),

    // Retrieval eval over the exact top-10: hits@10, NDCG@10, MRR with
    // "same label" relevance. DCG uses shared literal micro-long rank
    // discounts (dcgWeightsMicro) — integer sums, no cross-engine log().
    "q172_retrieval_ndcg" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val lab = emb.select(col("vec_id"), col("label"))
      val ranked = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 30), "embedding", "vec_id", k = 10)
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("__ql")), "query_id")
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("__nl")), "neighbor_id")
        .withColumn("rel", (col("__ql") === col("__nl")).cast("int"))
      val nrel = emb.groupBy(col("label").as("__ql2"))
        .agg((count(lit(1)) - 1).as("n_rel"))
      graft.operators.Evaluation.retrievalMetrics(
          ranked.join(broadcast(nrel), col("__ql") === col("__ql2")),
          "query_id", "rank", "rel", "n_rel", k = 10)
        .transform(ordered1(_, col("query_id")))
    }),

    // Preference-pair construction (DPO/RLHF reward-data shape): per
    // source, highest-scored doc = chosen, lowest = rejected, with the
    // margin. ONE struct-ordered min/max aggregation — no per-group sort.
    "q173_preference_pairs" -> ((s, d) => {
      graft.operators.Packing.preferencePairs(
          parallel(load(s, d, "documents")), "source", "doc_id",
          TextFunctions.tokenCount(col("text")))
        .transform(ordered1(_, col("source")))
    }),

    // Corpus-version diff from two additive manifests: per shard
    // added/removed/changed/unchanged + doc/byte deltas — which shards a
    // training run must re-read. Fixture: ~1% of docs retired, every
    // 50th edited.
    "q174_manifest_diff" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val cur = docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("text", when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Maintenance.manifestDiff(
          Maintenance.corpusManifest(docs, "doc_id", "text", numShards = 8),
          Maintenance.corpusManifest(cur, "doc_id", "text", numShards = 8))
        .transform(ordered1(_, col("shard")))
    }),


    // Spearman rank correlation between token count and char count —
    // "do two quality signals agree on ordering?" Exact midranks over
    // bounded value domains, doubled-rank integer moments.
    "q177_spearman" -> ((s, d) => {
      graft.operators.Evaluation.spearman(load(s, d, "documents"),
        TextFunctions.tokenCount(col("text")), col("n_chars"))
    }),

    // Chi-square independence audit: lang x source contingency with the
    // full zero-filled spine, expected counts, per-cell terms.
    "q178_chi2_bias" -> ((s, d) => {
      Profiling.contingencyChi2(load(s, d, "documents"), "lang", "source")
        .transform(ordered1(_, col("lang"), col("source")))
    }),

    // ROC curve points (TPR/FPR per distinct threshold) — the plottable
    // complement of q169's exact midrank AUC, same bounded-domain shape
    // as q170.
    "q179_roc_curve" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.rocCurve(emb,
          round(element_at(graft.functions.VectorFunctions
            .asDouble(col("embedding")), 1), 2),
          (col("label") >= 5).cast("int"))
        .transform(ordered1(_, col("threshold")))
    }),

    // Cohen's kappa between two heuristic raters (token-count vs
    // char-count thresholds): chance-corrected agreement from exact
    // marginal counts.
    "q180_rater_kappa" -> ((s, d) => {
      val docs = load(s, d, "documents")
      graft.operators.Evaluation.cohenKappa(docs,
        (TextFunctions.tokenCount(col("text")) >= 60).cast("int"),
        (col("n_chars") >= 300).cast("int"))
    }),

    // Per-cell cluster-vs-label purity panel over the q41/q100
    // first-10-centroid assignment.
    "q181_cluster_purity" -> ((s, d) => {
      Similarity.clusterLabelAgreement(parallel(load(s, d, "embeddings")),
          "embedding", "vec_id", "label", nlist = 10)
        .transform(ordered1(_, col("cell")))
    }),

    // One-row clustering summary: overall purity + NMI (nats) between
    // the cell assignment and the label column.
    "q182_cluster_nmi" -> ((s, d) => {
      Similarity.clusterAgreementSummary(parallel(load(s, d, "embeddings")),
        "embedding", "vec_id", "label", nlist = 10)
    }),

    // Per-source AUC fairness panel: does the (toy) length-based quality
    // score rank English docs equally well in every source? Same exact
    // midrank arithmetic as q169, windows partitioned by group.
    "q175_group_auc" -> ((s, d) => {
      graft.operators.Evaluation.aucBinaryBy(load(s, d, "documents"),
          "source",
          round(TextFunctions.tokenCount(col("text")).cast("double") /
            lit(100.0), 2),
          (col("lang") === "en").cast("int"))
        .transform(ordered1(_, col("source")))
    }),

    // Embedding-space outliers: top-20 by Euclidean distance to the
    // exact per-dimension centroid — the cheap mis-embedding screen.
    // One 1-row aggregation + broadcast + TakeOrderedAndProject.
    "q176_embedding_outliers" -> ((s, d) => {
      Similarity.centroidOutliers(load(s, d, "embeddings"),
          "embedding", "vec_id", dim = 64, k = 20)
        .transform(ordered1(_, col("dist").desc, col("vec_id")))
    }),

    // Exact two-sample KS: the largest ECDF gap between English and
    // non-English length distributions — unbinned drift gate (PSI's
    // complement). Two bounded distinct-value aggs, one window over the
    // merged frame, integer argmax.
    "q183_ks_test" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      graft.operators.Evaluation.ksTwoSample(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"),
        col("n_chars"))
    }),

    // Kendall's tau-b between coarse length and token-count buckets:
    // ordering-only association from the joint cell grid (O(cells²)
    // broadcast pair walk, row count never quadratic).
    "q184_kendall_tau" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      graft.operators.Evaluation.kendallTau(docs,
        floor(col("n_chars") / lit(100)),
        floor(TextFunctions.tokenCount(col("text")) / lit(20)))
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

    // Fleiss' kappa across a 3-heuristic labeling panel (token-count,
    // char-count, stopword-presence raters): one hash aggregation, no
    // join, no window.
    "q186_fleiss_kappa" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      graft.operators.Evaluation.fleissKappa(docs, Seq(
        (TextFunctions.tokenCount(col("text")) >= 60).cast("int"),
        (col("n_chars") >= 300).cast("int"),
        col("text").contains(" the ").cast("int")))
    }),

    // Exact covariance matrix of the leading 8 embedding dimensions:
    // one 1-row aggregation with decimal-quantized cross-product sums
    // (44 buffers), no explode — the geometry-drift monitor and the
    // PCA front end.
    "q187_embedding_cov" -> ((s, d) => {
      Similarity.embeddingCovariance(load(s, d, "embeddings"),
          "embedding", dims = 8)
        .transform(ordered1(_, col("i"), col("j")))
    }),

    // Theil-Sen robust activity trend per user: median pairwise slope
    // over per-day event counts (pair walk bounded by the day grid,
    // never the event count).
    "q188_theil_sen" -> ((s, d) => {
      val e = load(s, d, "events")
      val daily = e.groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2024-01-01")))
            .as("day"))
        .agg(count(lit(1)).as("cnt"))
      TimeSeries.theilSen(daily, "user_id", col("day"), col("cnt"))
        .transform(ordered1(_, col("user_id")))
    }),

    // Top principal component of the embedding cloud projected back onto
    // every vector: power iteration on the bounded 4x4 covariance runs
    // driver-side (the documented bounded-metadata idiom — the matrix IS
    // metadata), so the distributed work is ONE 1-row covariance
    // aggregation plus a per-row broadcast-literal dot. 30 iterations,
    // exact fixed-point early exit (provably oracle-safe: a fixed point
    // makes every further iteration a no-op).
    "q189_pca_project" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val cov = Similarity.embeddingCovariance(emb, "embedding", dims = 4)
      val comp = Similarity.topPrincipalComponent(cov, dims = 4,
        iterations = 30)
      Similarity.pcProject(emb, "embedding", "vec_id", comp)
        .transform(ordered1(_, col("vec_id")))
    }),

    // Declarative data-quality gate over the orders ingest: all
    // row-level checks fuse into ONE aggregation pass; uniqueness and
    // the functional dependency each pay exactly their own keyed hash
    // agg; referential is a broadcast anti-join count. One report row
    // per check.
    "q190_data_checks" -> ((s, d) => {
      import DataQuality._
      DataQuality.validate(load(s, d, "orders"), Seq(
        Completeness("c1_custkey_complete", col("o_custkey"), 1.0),
        Uniqueness("c2_orderkey_unique", Seq("o_orderkey")),
        ValueRange("c3_price_range", col("o_totalprice"), 0.0, 1000000.0),
        InSet("c4_status_domain", col("o_orderstatus"), Seq("O", "F", "P")),
        RowCountBetween("c5_rowcount", 1L, 100000000L),
        Referential("c6_custkey_ref", col("o_custkey"),
          load(s, d, "customer"), col("c_custkey")),
        FunctionalDep("c7_key_determines_date", Seq("o_orderkey"),
          col("o_orderdate"))))
    }),

    // Multi-class confusion matrix (zero-filled spine) for a
    // deterministic first-dim-quantile pseudo-classifier vs the true
    // label — the per-class error-geometry read.
    "q191_confusion" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.confusionMatrix(emb, col("label"),
          pmod(floor(element_at(graft.functions.VectorFunctions
            .asDouble(col("embedding")), 1) * 10).cast("long"), lit(10L)))
        .transform(ordered1(_, col("actual"), col("predicted")))
    }),

    // Per-class precision/recall/F1 over the same pseudo-classifier.
    "q192_class_report" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.classificationReport(emb, col("label"),
          pmod(floor(element_at(graft.functions.VectorFunctions
            .asDouble(col("embedding")), 1) * 10).cast("long"), lit(10L)))
        .transform(ordered1(_, col("label")))
    }),

    // Brier score + clamped log-loss in one aggregation pass over a
    // [0,1]-squashed first-dim probability.
    "q193_prob_scores" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val p = greatest(lit(0.0), least(lit(1.0),
        round(lit(0.5) + element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1) / lit(4.0), 3)))
      graft.operators.Evaluation.probScores(emb, p,
        (col("label") >= 5).cast("int"))
    }),

    // Mutual-information feature ranking: which quantized document
    // signal carries the most language-label information? Bounded
    // unpivot → one contingency aggregation per feature.
    "q195_mi_ranking" -> ((s, d) => {
      val docs = load(s, d, "documents")
      graft.operators.Features.miRanking(docs, Seq(
          "len_decile" -> least(floor(col("n_chars") / lit(100.0)), lit(9L))
            .cast("long"),
          "token_bucket" -> least(floor(TextFunctions.tokenCount(col("text"))
            / lit(20.0)), lit(9L)).cast("long"),
          "source" -> col("source")),
          col("lang"))
        .transform(ordered1(_, col("feature")))
    }),

    // Day-of-week x hour-of-day load shape with gap to the global mean
    // value; dow normalized to 0=Sunday on both engines.
    "q196_seasonal_profile" -> ((s, d) => {
      TimeSeries.seasonalProfile(load(s, d, "events"), col("ts"),
          col("value"))
        .transform(ordered1(_, col("dow"), col("hour")))
    }),

    // Fairness audit of the q191 pseudo-classifier binarized at
    // label>=5: per-source positive rate / TPR / FPR with gaps to the
    // global rates.
    "q197_fairness_panel" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val dim1 = element_at(graft.functions.VectorFunctions
        .asDouble(col("embedding")), 1)
      graft.operators.Evaluation.fairnessPanel(
          emb.withColumn("grp", pmod(col("vec_id"), lit(4L))),
          col("grp"),
          (dim1 >= 0).cast("int"),
          (col("label") >= 5).cast("int"))
        .transform(ordered1(_, col("group")))
    }),

    // Held-out bigram NLL under an add-1 bigram LM trained on the rest
    // of the corpus: bigrams built per-row (slice+zip, no positional
    // join), scoring join moves bigram TYPES only.
    "q198_bigram_nll" -> ((s, d) => {
      CorpusStats.bigramNll(parallel(load(s, d, "documents")), "text",
          "doc_id", "source", holdoutMod = 7)
        .transform(ordered1(_, col("source")))
    }),

    // Corpus Flesch reading-ease from exact integer totals (words,
    // [.!?]+ sentences, vowel-run syllables) — one aggregation pass.
    "q199_readability" -> ((s, d) => {
      CorpusStats.readability(load(s, d, "documents"), "text", "source")
        .transform(ordered1(_, col("source")))
    }),

    // Rank-biased overlap (p=0.9, k=20) between dim-1 and dim-2
    // rankings of the embedding corpus — everything after the two
    // TakeOrdered top-k selections runs on <= 2k rows.
    "q200_rbo" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      def dim(i: Int) = element_at(graft.functions.VectorFunctions
        .asDouble(col("embedding")), i)
      graft.operators.Evaluation.rankBiasedOverlap(
        emb.select(col("vec_id"), dim(1).as("s")),
        emb.select(col("vec_id"), dim(2).as("s")),
        col("vec_id"), col("s"), k = 20, p = 0.9)
    }),

    // Winsorized/trimmed order-value means per priority: exact
    // order-statistic fences from one cumulative walk over the
    // (group, cents) histogram.
    "q201_winsorized" -> ((s, d) => {
      Profiling.winsorizedStats(load(s, d, "orders"), "o_orderpriority",
          col("o_totalprice"), alpha = 0.05, scale = 2)
        .transform(ordered1(_, col("o_orderpriority")))
    }),

    // Hill tail index of the token frequency distribution over the
    // top-100 types — one Zipf-collapsed aggregation + TakeOrdered.
    "q202_tail_index" -> ((s, d) => {
      CorpusStats.tailIndex(parallel(load(s, d, "documents")), "text",
        k = 100)
    }),

    // Benford first-digit audit of order totals: exact unscaled-integer
    // digit extraction (never log10), zero-filled 1-9 spine.
    "q203_benford" -> ((s, d) => {
      Profiling.benfordAudit(load(s, d, "orders"), col("o_totalprice"),
          scale = 2)
        .transform(ordered1(_, col("digit")))
    }),

    // Two-proportion z-test with entity-level collapse (each user
    // converts once, not once per event) between the user_id-parity
    // variants.
    "q204_ab_test" -> ((s, d) => {
      graft.operators.Evaluation.abTest(load(s, d, "events"),
        when(pmod(col("user_id"), lit(2L)) === 0, lit("a"))
          .otherwise(lit("b")),
        col("user_id"),
        (col("event_type") === "purchase").cast("int"))
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

    // Burrows' Delta stylometry: per-source z-profiles over the top-50
    // corpus tokens, mean |z| distance per source pair — the
    // authorship-attribution read on "which sources write alike".
    "q216_stylometry" -> ((s, d) => {
      CorpusStats.burrowsDelta(parallel(load(s, d, "documents")), "text",
          "source", topK = 50)
        .transform(ordered1(_, col("source_a"), col("source_b")))
    }),

    // Native as-of join (custom LogicalPlan -> Strategy -> merge-pass
    // SparkPlan): every click annotated with the user's latest
    // at-or-before purchase value. The right side pre-collapses to one
    // row per (user, ts) so exact-tie winners are deterministic.
    "q222_asof_native" -> ((s, d) => {
      val e = load(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
        .withColumnRenamed("ts", "pts")
      Relational.asofJoinNative(clicks, purchases, "user_id", "ts", "pts",
          Seq("purchase_value"))
        .transform(ordered1(_, col("user_id"), col("ts"), col("event_id")))
    }),

    // Mann–Whitney U location-shift gate between click and view value
    // distributions (floor-quantized to a bounded domain): rank-based
    // complement of q183's KS — same bounded-histogram merge shape.
    "q223_mann_whitney" -> ((s, d) => {
      val e = parallel(load(s, d, "events"))
      val v = floor(col("value") * 10)
      graft.operators.Evaluation.mannWhitney(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "view"), v)
        .transform(ordered1(_, col("n_a")))
    }),

    // One-way ANOVA F across sources on document length: exact
    // decimal moment sums per source, one group agg + one fold.
    "q224_anova" -> ((s, d) => {
      val docs = load(s, d, "documents")
      graft.operators.Evaluation.anovaF(docs, col("source"),
          col("n_chars").cast("double"), scale = 0)
        .transform(ordered1(_, col("n")))
    }),

    // Wilson 95% lower-bound ranking of per-event-type "high value"
    // rates — small-sample-safe rate ordering, closed-form per group.
    "q225_wilson_ranking" -> ((s, d) => {
      val e = load(s, d, "events")
      graft.operators.Evaluation.wilsonRanking(e, col("event_type"),
          (col("value") >= 100.0).cast("int"))
        .transform(ordered1(_, col("wilson_low").desc, col("group")))
    }),

    // RFM customer-value grid: facts collapse to the customer dim
    // first, three deterministic NTILE axes, ≤125-cell output with
    // exact decimal revenue.
    "q226_rfm_segments" -> ((s, d) => {
      val o = load(s, d, "orders")
      Sessionize.rfmSegments(o, col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .transform(ordered1(_, col("r_score"), col("f_score"),
          col("m_score")))
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

    // Simpson diversity panel per source: coincidence probability,
    // effective vocabulary, heaviest-type share — all-integer folds.
    "q228_simpson_diversity" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      CorpusStats.simpsonDiversity(docs, col("source"), col("text"))
        .transform(ordered1(_, col("group")))
    }),

    // HHI + CR4 customer-spend concentration per market segment —
    // exact cent sums, one window on the entity dimension.
    "q229_concentration" -> ((s, d) => {
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      Profiling.concentration(
          o.join(c, col("o_custkey") === col("c_custkey")),
          col("c_mktsegment"), col("o_custkey"), col("o_totalprice"))
        .transform(ordered1(_, col("group")))
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

    // Propensity-score nearest-neighbor matching within a 0.02 caliper
    // (with replacement): bucketed candidate generation, never
    // treated × control; deterministic (|gap|, id) winner.
    "q231_psm_match" -> ((s, d) => {
      val emb = parallel(load(s, d, "embeddings"))
      val p = greatest(lit(0.0), least(lit(1.0),
        round(lit(0.5) + element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1) / lit(4.0), 3)))
      val scored = emb.select(col("vec_id"), p.as("p"),
        (col("label") >= 5).as("__t"))
      EntityResolution.nearestScoreMatch(
          scored.filter(col("__t")), scored.filter(!col("__t")),
          "vec_id", col("p"), caliper = 0.02)
        .transform(ordered1(_, col("treated_id")))
    }),

    // Simplified silhouette per label cluster: centroid-based a/b —
    // the scale-shippable O(n·k) variant, exact-decimal centroids.
    "q232_silhouette" -> ((s, d) => {
      Similarity.simplifiedSilhouette(parallel(load(s, d, "embeddings")),
          "embedding", "vec_id", "label", dim = 64)
        .transform(ordered1(_, col("cluster")))
    }),

    // Fuzzy name matching: the codegen'd Jaro-Winkler comparator over
    // PREFIX-blocked customer pairs (the EntityResolution discipline —
    // TextFunctions.jaroWinkler's own contract says "BLOCKED pairs
    // only"), global top-50 via TakeOrderedAndProject. The block key is
    // the name minus its last two characters: block SIZE is bounded by
    // the alphabet (≤100 digit tails here) no matter the corpus, so the
    // candidate-pair count grows LINEARLY in n — unlike the previous
    // c_nationkey block (25 fixed values → O(n²/25) pairs, ~45 B at
    // sf10). EntityResolution.link supplies the degenerate-block
    // fail-fast: any block whose pair product exceeds maxBlock raises
    // with the offending key instead of running a quadratic plan.
    "q233_jaro_names" -> ((s, d) => {
      val base = load(s, d, "customer").select(
        expr("substring(c_name, 1, length(c_name) - 2)").as("blk"),
        col("c_custkey").as("id"), col("c_name").as("name"))
      EntityResolution.link(base, base, Seq("blk"),
          Seq(TextFunctions.jaroWinkler(col("name_a"), col("name_b"))),
          threshold = 0.0, maxBlock = 65536L)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), round(col("score"), 6).as("jw"))
        .orderBy(col("jw").desc, col("id_a").asc, col("id_b").asc)
        .limit(50)
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

    // CUPED variance-reduced A/B readout: units = users, arms by
    // user-id parity, pre/post split at mid-month — one unit hash agg,
    // one 9-moment fold, exact decimal moments.
    "q236_cuped" -> ((s, d) => {
      val e = load(s, d, "events")
      graft.operators.Evaluation.cuped(
          e.filter(col("ts").isNotNull),
          col("user_id"), pmod(col("user_id"), lit(2L)) === 0L,
          col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"),
          col("value"), scale = 2)
        .transform(ordered1(_, col("n_units")))
    }),

    // Per-type OLS daily trend + Durbin-Watson residual audit: exact
    // decimal moments per group, one lag window over the bounded
    // daily frame only.
    "q237_ols_trend" -> ((s, d) => {
      val e = load(s, d, "events")
      val daily = e
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type").as("g"),
          datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("day"))
        .agg(count(lit(1)).as("n_events"))
      TimeSeries.olsTrend(daily, "g", "day", "n_events")
        .transform(ordered1(_, col("group")))
    }),

    // Empirical-Bayes shrinkage of per-brand mean retail price toward
    // the grand mean — one group agg, one 1-row broadcast panel.
    "q238_eb_shrinkage" -> ((s, d) => {
      graft.operators.Profiling.ebShrinkMeans(load(s, d, "part"),
          col("p_brand"), col("p_retailprice"), scale = 2)
        .transform(ordered1(_, col("group")))
    }),

    // Kruskal-Wallis H across languages on doc length — the k-group
    // rank test; exact doubled rank sums on the value histogram.
    "q239_kruskal_wallis" -> ((s, d) => {
      val docs = load(s, d, "documents")
      graft.operators.Evaluation.kruskalWallis(docs, col("lang"),
          col("n_chars"))
        .transform(ordered1(_, col("n")))
    }),

    // Wald-Wolfowitz runs test on the daily event-count series:
    // above/below-median sign sequence, exact run counts.
    "q240_runs_test" -> ((s, d) => {
      val e = load(s, d, "events")
      val daily = e.filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeries.runsTest(daily, "day", "n")
        .transform(ordered1(_, col("runs")))
    }),

    // Directed association rules over per-user event-type baskets:
    // support/confidence/lift/conviction, top-20 by lift.
    "q241_assoc_rules" -> ((s, d) => {
      Itemsets.associationRules(load(s, d, "events"), "user_id",
          "event_type", minCount = 5L, topK = 20)
        .transform(ordered1(_, col("lift").desc, col("antecedent"),
          col("consequent")))
    }),

    // Incremental agg-over-join view refresh: revenue-per-nation view
    // built from 3/4 of orders, delta batch (1/4) joined + merged —
    // must equal the full recompute the oracle runs. Exact unscaled
    // sums so the identity is bitwise.
    "q242_view_refresh" -> ((s, d) => {
      val orders = load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unscaledLong(col("o_totalprice"), 2).as("price_u"))
      val cust = load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val base = orders.filter(pmod(col("o_orderkey"), lit(4L)) =!= 0L)
      val delta = orders.filter(pmod(col("o_orderkey"), lit(4L)) === 0L)
      val view = IncrementalAgg.partial(
        base.join(cust, col("o_custkey") === col("c_custkey")),
        Seq("c_nationkey"), "price_u")
      IncrementalAgg.refreshJoinView(view, delta, cust,
          "o_custkey", "c_custkey", "c_nationkey", "price_u")
        .select(col("c_nationkey").as("nation"), col("n").as("n_orders"),
          graft.functions.Decimals.fromUnscaled(col("sum_m"), 2)
            .as("revenue"),
          (col("min_m").cast("double") / lit(100.0)).as("min_price"),
          (col("max_m").cast("double") / lit(100.0)).as("max_price"))
        .transform(ordered1(_, col("nation")))
    }),

    // Bland-Altman agreement between the recorded n_chars and a
    // recomputed length(text) — bias, 1.96-SD limits, outside share,
    // all over the bounded diff histogram.
    "q243_bland_altman" -> ((s, d) => {
      val docs = load(s, d, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      graft.operators.Evaluation.blandAltman(docs, col("n_chars"),
          length(col("text")), scale = 0)
        .transform(ordered1(_, col("n")))
    }),

    // Closest part-name pairs by TRUE Damerau-Levenshtein within
    // (brand, size) blocks — codegen'd Lowrance-Wagner kernel on a
    // blocked candidate frame, top-50 on the integer distance.
    "q244_damerau_names" -> ((s, d) => {
      val p = load(s, d, "part")
      val a = p.select(col("p_brand").as("bk"), col("p_size").as("sk"),
        col("p_partkey").as("id_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("bk"), col("p_size").as("sk"),
        col("p_partkey").as("id_b"), col("p_name").as("name_b"))
      a.join(b, Seq("bk", "sk")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          TextFunctions.damerauLevenshtein(col("name_a"), col("name_b"))
            .as("dl"))
        .orderBy(col("dl").asc, col("id_a").asc, col("id_b").asc)
        .limit(50)
    }),

    // Mann-Kendall monotonic-trend test on daily purchase counts —
    // the quadratic step runs on the bounded daily frame only.
    "q245_mann_kendall" -> ((s, d) => {
      val e = load(s, d, "events")
      val daily = e
        .filter(col("ts").isNotNull && col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeries.mannKendall(daily, "day", "n")
        .transform(ordered1(_, col("n")))
    }),

    // Cochran's Q across three embedding-dim sign "raters" — one
    // aggregation pass, exact integer totals.
    "q246_cochran_q" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
      val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
      graft.operators.Evaluation.cochranQ(emb,
          (1 to 3).map(j => (element_at(v, j) > 0).cast("int")))
        .transform(ordered1(_, col("n_items")))
    }),

    // IPF raking of the post-period (event_type x user-parity) grid
    // to pre-period margins — two fixed iterations of bounded-frame
    // scalings; the post-stratification reweighting read.
    "q247_rake_weights" -> ((s, d) => {
      val e = load(s, d, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val post = e.filter(col("ts") >= cut)
      val pre = e.filter(col("ts") < cut)
      val cells = post
        .groupBy(col("event_type").as("row_key"),
          pmod(col("user_id"), lit(2L)).as("col_key"))
        .agg(count(lit(1)).as("n"))
      val totals = broadcast(pre.agg(count(lit(1)).as("__pre"))
        .crossJoin(post.agg(count(lit(1)).as("__post"))))
      def scaled(margins: DataFrame, key: String) = margins
        .crossJoin(totals)
        .select(col(key),
          (col("__c").cast("double") * col("__post").cast("double") /
            col("__pre").cast("double")).as("target"))
      val rowT = scaled(pre.groupBy(col("event_type").as("row_key"))
        .agg(count(lit(1)).as("__c")), "row_key")
      val colT = scaled(pre.groupBy(pmod(col("user_id"), lit(2L))
        .as("col_key")).agg(count(lit(1)).as("__c")), "col_key")
      Curation.rakeWeights(cells, rowT, colT, iterations = 2)
        .transform(ordered1(_, col("row_key"), col("col_key")))
    }),

    // CDC-signed view maintenance: deletes (keys %10=0) and updates
    // (+5.00 on keys %7=0) applied as retract/insert pairs — must
    // equal the oracle's from-scratch recompute of the final state.
    "q248_signed_view" -> ((s, d) => {
      val orders = load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unscaledLong(col("o_totalprice"), 2).as("price_u"))
      val cust = load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val view = IncrementalAgg.signedPartial(
        orders.withColumn("sign", lit(1L))
          .join(cust, col("o_custkey") === col("c_custkey")),
        Seq("c_nationkey"), "price_u", col("sign"))
      val deletes = orders.filter(pmod(col("o_orderkey"), lit(10L)) === 0L)
        .withColumn("sign", lit(-1L))
      val upOld = orders
        .filter(pmod(col("o_orderkey"), lit(7L)) === 0L &&
          pmod(col("o_orderkey"), lit(10L)) =!= 0L)
        .withColumn("sign", lit(-1L))
      val upNew = upOld
        .withColumn("price_u", col("price_u") + lit(500L))
        .withColumn("sign", lit(1L))
      val delta = deletes.unionByName(upOld).unionByName(upNew)
      IncrementalAgg.refreshSignedJoinView(view, delta, cust,
          "o_custkey", "c_custkey", "c_nationkey", "price_u", col("sign"))
        .select(col("c_nationkey").as("nation"), col("n").as("n_orders"),
          graft.functions.Decimals.fromUnscaled(col("sum_m"), 2)
            .as("revenue"))
        .transform(ordered1(_, col("nation")))
    }),

    // Brown-Forsythe variance-homogeneity test of doc length across
    // sources: exact scale-1 moments on |x - group median|.
    "q249_brown_forsythe" -> ((s, d) => {
      val docs = load(s, d, "documents")
        .filter(col("source").isNotNull)
      graft.operators.Evaluation.brownForsythe(docs, col("source"),
          col("n_chars"))
        .transform(ordered1(_, col("n")))
    }),

    // Exact-substring (Lee et al.) duplicated-span extraction: maximal
    // runs of corpus-duplicated 8-token grams per document — the
    // memorization-risk segments. One gram-hash shuffle + per-doc
    // gap-and-island windows; see TextDedup.duplicatedSpans.
    "q250_dup_spans" -> ((s, d) => {
      TextDedup.duplicatedSpans(parallel(load(s, d, "documents")),
          "text", "doc_id", k = 8, minDocs = 2)
        .transform(ordered1(_, col("doc_id"), col("span_start")))
    }),

    // Rarity-weighted contamination: the share of each training doc's
    // rarity-weighted 5-gram mass that overlaps the q73 eval split —
    // integer-exact floor(1e6/df) weights so cross-engine sums agree
    // bitwise; boilerplate overlap scores low, eval-unique overlap high.
    "q256_weighted_contamination" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      TextDedup.weightedContamination(
          docs.filter(col("doc_id") % 20 =!= 7),
          docs.filter(col("doc_id") % 20 === 7),
          "text", "doc_id", k = 5)
        .transform(ordered1(_, col("doc_id")))
    }),

    // Surgical decontamination: WHERE each training doc overlaps the
    // q73 eval split (maximal contaminated 5-gram spans), not just
    // whether — the span a pipeline cuts instead of dropping the doc.
    "q255_contaminated_spans" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      TextDedup.contaminatedSpans(
          docs.filter(col("doc_id") % 20 =!= 7),
          docs.filter(col("doc_id") % 20 === 7),
          "text", "doc_id", k = 5)
        .transform(ordered1(_, col("doc_id"), col("span_start")))
    }),

    // Near-dup pair EVIDENCE: for each LSH candidate pair, the longest
    // shared contiguous token run (diagonal-run construction over
    // matching 8-gram positions) and the shared-occurrence count —
    // the span a reviewer reads before trusting a dedup verdict.
    "q254_shared_spans" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.sharedSpanOnPairs(pairs, docs, "text", "doc_id", k = 8)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // MOSS pair detection: document pairs sharing >= 3 winnowing
    // fingerprints (q96's k=3, w=4 selection), with the exact Jaccard
    // verify attached; fingerprint equi-join with the mega-carrier
    // fail-fast, never all-pairs.
    "q253_winnow_pairs" -> ((s, d) => {
      TextDedup.winnowPairs(parallel(load(s, d, "documents")),
          "text", "doc_id", k = 3, w = 4, minShared = 3)
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // Token-level exact-substring dedup impact per source: duplicated
    // spans merged into disjoint token intervals (running-max sweep),
    // then token shares — the dataset-card accounting doc-level
    // scorecards (q112) hide.
    "q252_dup_token_impact" -> ((s, d) => {
      TextDedup.duplicatedTokenImpact(parallel(load(s, d, "documents")),
          "text", "doc_id", "source", k = 8, minDocs = 2)
        .transform(ordered1(_, col("source")))
    }),

    // MinHash estimator calibration over the q26 candidate machinery:
    // sketch-estimated vs exact Jaccard per candidate pair, with the
    // absolute error — the sketch audit run before trusting banding
    // thresholds.
    "q251_minhash_calibration" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
      val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
      TextDedup.minhashCalibration(pairs, sigs, docs, "text", "doc_id")
        .transform(ordered1(_, col("doc_id_a"), col("doc_id_b")))
    }),

    // Gains/lift decile table for the first-dim score vs label>=5 —
    // bounded histogram walk, whole score runs per bucket.
    "q219_gains_table" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.gainsTable(emb,
          round(element_at(graft.functions.VectorFunctions
            .asDouble(col("embedding")), 1), 2),
          (col("label") >= 5).cast("int"), buckets = 10)
        .transform(ordered1(_, col("bucket")))
    }),

    // Unigram entropy rate per source (bits/token): the compression /
    // diversity read — one Zipf-collapsed aggregation + per-source fold.
    "q220_entropy_rate" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      val counts = docs.filter(col("text").isNotNull)
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("__c"))
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      val p = col("__c").cast("double") / col("__n").cast("double")
      counts.withColumn("__n", sum(col("__c")).over(ws))
        .groupBy(col("source"))
        .agg(max(col("__n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          round(sum(-p * log(p)) / lit(math.log(2.0)), 6)
            .as("bits_per_token"))
        .transform(ordered1(_, col("source")))
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

    // Cramér's V association screen across categorical pairs (the
    // zero-spine mass folded as n - Σ_obs e, no spine join).
    "q217_cramers_v" -> ((s, d) => {
      val docs = load(s, d, "documents")
      val lenBucket = least(floor(col("n_chars") / lit(200.0)), lit(4L))
      Profiling.cramersV(docs, Seq(
          ("lang_source", col("lang"), col("source")),
          ("lang_length", col("lang"), lenBucket),
          ("source_length", col("source"), lenBucket)))
        .transform(ordered1(_, col("pair")))
    }),

    // Uncertainty sampling for active labeling: the 3 least-confident
    // docs per label bucket under the q193 probability squash —
    // window-group-limit shape, margin ascending.
    "q218_uncertainty_sample" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val p = greatest(lit(0.0), least(lit(1.0),
        round(lit(0.5) + element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1) / lit(4.0), 3)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label"))
        .orderBy(col("margin").asc, col("vec_id").asc)
      emb.select(col("label"), col("vec_id"), p.as("p"),
          // p carries 3 decimals, so the margin is already exact —
          // round(.,6) is the identity, kept for the output convention
          round(abs(p - lit(0.5)), 6).as("margin"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .drop("__rn")
        .transform(ordered1(_, col("label"), col("margin"),
          col("vec_id")))
    }),

    // Covariate balance of the vec_id-parity split: per-covariate
    // standardized mean difference from exact integer sums.
    "q212_covariate_balance" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      def dim(i: Int) = element_at(graft.functions.VectorFunctions
        .asDouble(col("embedding")), i)
      graft.operators.Evaluation.covariateBalance(emb,
          pmod(col("vec_id"), lit(2L)).cast("int"),
          Seq("dim1" -> dim(1), "dim2" -> dim(2),
            "label" -> col("label").cast("double")))
        .transform(ordered1(_, col("covariate")))
    }),

    // Q-Q drift table: decile cuts of pre- vs post-1997 order values
    // ($10-quantized histogram), exact ceil(n*k/10) rank picks.
    "q213_qq_table" -> ((s, d) => {
      val o = load(s, d, "orders")
      val v = round(col("o_totalprice"), -1)
      Profiling.qqTable(
          o.filter(col("o_orderdate") <
            lit(java.sql.Date.valueOf("1997-01-01"))).select(v.as("v")),
          o.filter(col("o_orderdate") >=
            lit(java.sql.Date.valueOf("1997-01-01"))).select(v.as("v")),
          col("v"), quantiles = 10)
        .transform(ordered1(_, col("quantile")))
    }),

    // Next-event predictability: conditional entropy per prev type
    // from one lead-window pass over the per-user order.
    "q214_transition_entropy" -> ((s, d) => {
      Sessionize.transitionEntropy(load(s, d, "events"), "user_id", "ts",
          "event_id", "event_type")
        .transform(ordered1(_, col("event_type")))
    }),

    // Deterministic half-subsample envelope for the mean order value:
    // one 34-buffer aggregation pass, membership = md5 hex-digit
    // parity, never materialized.
    "q210_subsample_ci" -> ((s, d) => {
      Profiling.subsampleCI(load(s, d, "orders"), col("o_orderkey"),
        col("o_totalprice"), nResamples = 16, scale = 2)
    }),

    // BBSE label-shift correction: confusion on the vec_id%7 holdout,
    // predicted marginal on the rest, closed-form 2x2 solve.
    "q211_label_shift" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val pred = (element_at(graft.functions.VectorFunctions
        .asDouble(col("embedding")), 1) >= 0).cast("int")
      val lab = (col("label") >= 5).cast("int")
      graft.operators.Evaluation.labelShiftBinary(
        emb.filter(pmod(col("vec_id"), lit(7L)) === 0),
        emb.filter(pmod(col("vec_id"), lit(7L)) =!= 0),
        pred, lab)
    }),

    // Difference-in-differences: user-parity treatment x mid-January
    // period split over event values — one 8-sum aggregation pass.
    "q208_did" -> ((s, d) => {
      val e = load(s, d, "events")
      graft.operators.Evaluation.diffInDiff(e,
        pmod(col("user_id"), lit(2L)).cast("int"),
        (col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00")))
          .cast("int"),
        col("value"))
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

    // Jensen-Shannon divergence between pre-/post-1997 order-value
    // histograms — the symmetric bounded drift number.
    "q206_js_divergence" -> ((s, d) => {
      val o = load(s, d, "orders")
      val bin = floor(col("o_totalprice") / lit(10000.0)).cast("long")
      graft.operators.Evaluation.jsDivergence(
        o.filter(col("o_orderdate") <
          lit(java.sql.Date.valueOf("1997-01-01"))).select(bin.as("bin")),
        o.filter(col("o_orderdate") >=
          lit(java.sql.Date.valueOf("1997-01-01"))).select(bin.as("bin")),
        col("bin"))
    }),

    // Split-conformal threshold at alpha=0.1 over the quantized
    // first-dim nonconformity score.
    "q207_conformal" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      graft.operators.Evaluation.conformalThreshold(emb,
        round(abs(element_at(graft.functions.VectorFunctions
          .asDouble(col("embedding")), 1)), 2),
        alpha = 0.1)
    }),

    // McNemar disagreement-cell test between two single-dim
    // pseudo-classifiers scored on the same rows.
    "q194_mcnemar" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      def pred(dim: Int) = pmod(floor(element_at(graft.functions
        .VectorFunctions.asDouble(col("embedding")), dim) * 10)
        .cast("long"), lit(10L))
      graft.operators.Evaluation.mcnemar(emb,
        (pred(1) === col("label").cast("long")).cast("int"),
        (pred(2) === col("label").cast("long")).cast("int"))
    }),

    // BERT-style MLM masking: ~15% of positions selected by hash, 80/10/10
    // [MASK]/doc-local-replacement/keep, labels = pos:original targets.
    // Pure projection — no explode, no window, no join.
    "q153_mlm_mask" -> ((s, d) => {
      graft.operators.Packing.mlmMask(parallel(load(s, d, "documents")),
          "text", "doc_id")
        .transform(ordered1(_, col("doc_id")))
    }),

    // KMV distinct-cardinality sketch: per-source approximate distinct
    // token count via the k-minimum-values estimator (bounded-state
    // custom aggregate — the 100 TB substitute for count(distinct)).
    // Input rides tokenTf's map keys: per-doc distinct tokens, no
    // occurrence-level explode.
    "q130_kmv_distinct" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      Profiling.approxDistinct(
          docs.select(col("source"),
            explode(map_keys(TextFunctions.tokenTf(col("text")))).as("token")),
          Seq("source"), col("token"), k = 32)
        .transform(ordered1(_, col("source")))
    }),

    // One-pass multi-column table profile: null counts, KMV distinct
    // estimates, numeric min/max/exact-decimal mean, string lengths —
    // a single aggregation with bounded per-column sketch state (no
    // Expand, no per-column passes).
    "q131_profile" -> ((s, d) => {
      Profiling.profile(load(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"), k = 256)
        .transform(ordered1(_, col("column")))
    }),

    // KMV sketch algebra: distinct-key overlap of two tables (the join
    // planner's cardinality question) from two bounded sketches — no
    // join, no shuffled data rows.
    "q132_join_cardinality" -> ((s, d) => {
      Profiling.overlapEstimate(
        load(s, d, "orders"), col("o_custkey"),
        load(s, d, "customer"), col("c_custkey"), k = 128)
    }),

    // Change-data feed between two snapshot versions (CDC): one
    // key-keyed full-outer join classifying insert/update/delete, the
    // inverse of the MERGE family. Versions are deterministic
    // perturbations of orders (%11=3 inserted, %11=7 deleted, %5=0
    // repriced).
    "q133_snapshot_diff" -> ((s, d) => {
      val base = load(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val oldDf = base.filter(col("o_orderkey") % 11 =!= 3)
      val newDf = base.filter(col("o_orderkey") % 11 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.5)
            .otherwise(col("o_totalprice")))
      Merge.snapshotDiff(oldDf, newDf, Seq("o_orderkey"))
        .transform(ordered1(_, col("o_orderkey")))
    }),

    // ANN quality gate: recall@3 of the LSH index against the exact
    // brute-force neighbors — the eval an ANN path must pass before the
    // exact path is retired.
    "q134_ann_recall" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 3),
          Similarity.lshTopK(emb, queries, "embedding", "vec_id", k = 3,
            planes = Similarity.deterministicPlanes(4, 64)),
          "query_id", "neighbor_id")
        .transform(ordered1(_, col("query_id")))
    }),

    // Incrementally-maintained COUNT DISTINCT: three per-batch partials
    // (additive measures + bounded KMV sketch) merged at read time —
    // bit-identical to the single-pass whole-history aggregate by the
    // k-minima union law, so the oracle computes the latter.
    "q135_incremental_distinct" -> ((s, d) => {
      val ev = load(s, d, "events")
        .select(col("event_type"), col("event_id"), col("user_id"))
      val parts = Seq(0, 1, 2).map(m =>
        IncrementalAgg.partialWithDistinct(
          ev.filter(pmod(col("event_id"), lit(3)) === m),
          Seq("event_type"), "event_id", "user_id", 64))
      IncrementalAgg.estimateDistinct(
          IncrementalAgg.mergePartialsWithDistinct(parts, Seq("event_type"), 64), 64)
        .select(col("event_type"), col("n"), col("sum_m"), col("est_distinct"))
        .transform(ordered1(_, col("event_type")))
    }),

    // SemDeDup: embedding-space dedup with the pairwise cosine bounded
    // to IVF cells (all-pairs is O(n²); clusters make it tractable) —
    // min-id keeper election per ε-ball.
    "q136_semantic_dedup" -> ((s, d) => {
      Similarity.semanticDedup(load(s, d, "embeddings"), "embedding",
          "vec_id", nlist = 8, threshold = 0.3)
        .transform(ordered1(_, col("vec_id")))
    }),

    // Per-source corpus profile: the one-pass no-Expand profiler keyed
    // by source — per-stratum row/null counts, KMV distinct estimates,
    // length and n_chars stats in a single keyed aggregation.
    "q141_profile_by_source" -> ((s, d) => {
      Profiling.profileBy(load(s, d, "documents"), Seq("source"),
          Seq("text", "n_chars"), k = 64)
        .transform(ordered1(_, col("source"), col("column")))
    }),

    // Per-column snapshot profile drift: two one-pass profiles joined —
    // null-ratio delta, distinct-estimate ratio, mean shift per column.
    // The even/odd orders split with a %7 price bump and %11 nulled
    // priority plants drift in exactly two columns.
    "q144_profile_diff" -> ((s, d) => {
      val o = load(s, d, "orders")
      Profiling.profileDiff(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1)
            .withColumn("o_totalprice",
              when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
                .otherwise(col("o_totalprice")))
            .withColumn("o_orderpriority",
              when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
                .otherwise(col("o_orderpriority"))),
          Seq("o_custkey", "o_totalprice", "o_orderpriority"), k = 256)
        .transform(ordered1(_, col("column")))
    }),

    // Exact corpus vocabulary head (heavy hitters) with bounded state:
    // a Misra-Gries candidate pass (k counters, one narrow exchange —
    // the token cardinality never shuffles) then a broadcast exact
    // confirm pass. Every token at >= 0.2% of all occurrences, with its
    // exact count — the high-frequency-token audit of a corpus card.
    "q143_heavy_hitters" -> ((s, d) => {
      Profiling.heavyHitters(
          parallel(load(s, d, "documents"))
            .select(explode(TextFunctions.tokens(col("text"))).as("token")),
          col("token"), minSharePpm = 2000L)
        .transform(ordered1(_, desc("n_rows"), col("key")))
    }),

    // Z-order clustered rewrite + data-skipping audit, hash-gated
    // against the parquet FOOTERS: Spark writes the Morton-clustered
    // lineitem slice to a fixed work dir and derives the per-file
    // min/max envelope from the DATA (skippingStats); the DuckDB oracle
    // reads the same files' footer statistics (parquet_metadata) — so
    // the gate cross-checks the audit against what the footers actually
    // promise a scanner. The work dir is fixed because the oracle SQL
    // is static text; the driver runs Verify before the oracle compare,
    // never concurrently.
    "q142_zorder_skipping" -> ((s, d) => {
      val dir = "/tmp/graft_q142_zorder/t"
      Maintenance.zorderWrite(s,
        load(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), dir, numFiles = 8, bitsPerDim = 4)
      Maintenance.skippingStats(s, dir, Seq("l_partkey", "l_suppkey"))
        // input_file_name is a file:// URI; the oracle sees the plain
        // path its glob matched — normalize to the oracle's rendering
        .select(regexp_replace(col("file"), "^file:/+", "/").as("file"),
          col("n_rows"), col("l_partkey_min"), col("l_partkey_max"),
          col("l_suppkey_min"), col("l_suppkey_max"))
        .transform(ordered1(_, col("file")))
    }),

    // IVF index on DISK in the cell-partitioned layout: build, compact
    // to cell=<id> directories, read back, search — answers must equal
    // the in-memory q41 exactly (same oracle), while the storage layout
    // lets a probe-bounded search read only its cells' directories.
    // Fixed work dir for the same reason as q142.
    "q154_ivf_partitioned" -> ((s, d) => {
      val dir = "/tmp/graft_q154_ivfidx/t"
      val emb = load(s, d, "embeddings")
      val idx = Similarity.buildIvfIndex(emb, "embedding", "vec_id", nlist = 8)
      Maintenance.compactIvfIndex(idx.entries, dir)
      Similarity.ivfSearch(
          Similarity.IvfIndex(idx.centroids, s.read.parquet(dir)),
          emb.filter(col("vec_id") < 5), "embedding", "vec_id",
          k = 3, nProbe = 2)
        .transform(ordered1(_, col("query_id"), col("rank")))
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
    // enumeration behind the maxDegree wedge-bomb guard.
    "q156_triangles" -> ((s, d) => {
      val it = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = it.alias("a").join(it.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      Graph.triangleStats(edges, "x", "y")
        .transform(ordered1(_, col("node")))
    }),

    // PSI drift monitor: reference-quantile bins (order-statistics
    // edges, no global window), both snapshots counted in, per-bin
    // (p−q)·ln(p/q) terms — the production feature-drift gate.
    "q140_drift_psi" -> ((s, d) => {
      val o = load(s, d, "orders")
      Profiling.driftPsi(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1)
            .withColumn("o_totalprice",
              when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.1)
                .otherwise(col("o_totalprice"))),
          "o_totalprice", bins = 10)
        .transform(ordered1(_, col("bin")))
    }),

    // Blocked probabilistic record linkage (Fellegi-Sunter): customer
    // linked against a deterministically perturbed second source —
    // blocking on (nation, segment) bounds candidate pairs; field
    // log-odds scores threshold into links. The %7 nationkey perturbation
    // lands in the wrong block and the %13 name mangle under-scores, so
    // precision stays 1.0 while recall measures both loss modes.
    "q139_record_linkage" -> ((s, d) => {
      val a = load(s, d, "customer")
      val b = a
        .withColumn("c_name",
          when(col("c_custkey") % 13 === 0, concat(col("c_name"), lit(" jr")))
            .when(col("c_custkey") % 3 === 0,
              lower(regexp_replace(col("c_name"), "#", " ")))
            .otherwise(col("c_name")))
        .withColumn("c_nationkey",
          when(col("c_custkey") % 7 === 0,
            pmod(col("c_nationkey") + 1, lit(25)).cast("int"))
            .otherwise(col("c_nationkey")))
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + 0.01)
            .otherwise(col("c_acctbal")))
        .filter(col("c_custkey") % 11 =!= 4)
      def norm(c: Column) = lower(regexp_replace(c, "#", " "))
      // normalize ONCE per row before blocking, not per candidate pair:
      // the field comparator runs |block|² times, so an in-comparator
      // regexp_replace costs ~1.8M regex evaluations at sf0.1 where the
      // per-side precompute costs 2×15k (measured 1.66 -> 1.10 s)
      val aN = a.withColumn("__nname", norm(col("c_name")))
      val bN = b.withColumn("__nname", norm(col("c_name")))
      val links = EntityResolution.link(aN, bN,
        Seq("c_nationkey", "c_mktsegment"),
        Seq(
          when(col("__nname_a") === col("__nname_b"), 4.0)
            .otherwise(-1.5),
          when(abs(col("c_acctbal_a") - col("c_acctbal_b")) <= 0.02, 2.0)
            .otherwise(-0.5)),
        threshold = 4.0)
      EntityResolution.evalLinksAgainst(links,
        col("c_custkey_a") === col("c_custkey_b"),
        b.agg(count(lit(1)).as("n_true")))
    }),

    // Multi-probe LSH ANN: each query also probes the Hamming-1 buckets
    // (one hyperplane flipped) — recall toward exact without growing the
    // one-row-per-vector index; only the broadcast query side fans out.
    "q138_knn_multiprobe" -> ((s, d) => {
      val emb = load(s, d, "embeddings")
      val planes = Similarity.deterministicPlanes(4, 64)
      Similarity.lshSearchMultiProbe(
          Similarity.buildLshIndex(emb, "embedding", "vec_id", planes),
          emb.filter(col("vec_id") < 5), "embedding", "vec_id", k = 3, planes)
        .transform(ordered1(_, col("query_id"), col("rank")))
    }),

    // Content-defined chunking dedup audit: variable-size chunks split
    // at rolling-hash content boundaries (edit-resilient, unlike fixed
    // windows), then per-source chunk-level duplication ratio.
    "q137_cdc_dedup" -> ((s, d) => {
      val docs = parallel(load(s, d, "documents"))
      docs.select(col("source"),
          explode(TextFunctions.cdcChunks(col("text"), 8, 1)).as("chunk"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk")).as("n_distinct"),
          round(lit(1.0) - countDistinct(col("chunk")).cast("double")
            / count(lit(1)).cast("double"), 6).as("dup_ratio"),
          round(sum(length(col("chunk"))).cast("double")
            / count(lit(1)).cast("double"), 6).as("avg_len"))
        .transform(ordered1(_, col("source")))
    })
  )

  // ------------------------------------------------------------ oracle SQL

  /** Shared CTE text for the minhash-family oracles: one md5 per shingle,
    * k components from disjoint 8-hex-char digest slices (mirrors
    * [[graft.operators.TextDedup.minhashSignatures]]). */
  /** Exact eval-overlap decontamination answer (q73); q101's Bloom
    * variant must reproduce it bit-for-bit because its sketch only
    * pre-filters ahead of the exact-verify join. */
  private val DecontaminateOracle =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
      |  FOR i IN generate_series(1, greatest(len(t)-2, 1))]) AS s FROM toks),
      |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 7),
      |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 7)
      |SELECT doc_id, count(*) AS n_overlap
      |FROM tr JOIN ev USING (g)
      |GROUP BY doc_id HAVING count(*) >= 1
      |ORDER BY doc_id""".stripMargin

  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |hs AS (SELECT doc_id,
      |  [md5(array_to_string(t[i:i+2], ' ')) FOR i IN generate_series(1, greatest(len(t)-2, 1))] AS h
      |  FROM toks),
      |sig AS (SELECT doc_id,
      |  list_min([substring(x, 1, 8) FOR x IN h]) AS sig_0,
      |  list_min([substring(x, 9, 8) FOR x IN h]) AS sig_1,
      |  list_min([substring(x, 17, 8) FOR x IN h]) AS sig_2,
      |  list_min([substring(x, 25, 8) FOR x IN h]) AS sig_3
      |  FROM hs)""".stripMargin

  private def simhashBitsSql(bits: Int): String = (0 until bits).map { j =>
    s"CASE WHEN 2 * len(list_filter(t, x -> substring(md5(x), ${j + 1}, 1) >= '8')) > len(t) THEN ${1L << j} ELSE 0 END"
  }.mkString(" + ")

  /** The KMV estimate over a sorted min-hash list column `arr` (matching
    * [[graft.operators.Profiling.kmvEstimate]]): the k-th hash's first 13
    * hex digits as a fraction of 16^13 = 2^52. Rendered as a digit-sum of
    * exact integer literals — every intermediate is an exact-in-double
    * integer < 2^52, so the sum is EXACT regardless of association and
    * both engines reach the identical double before the one rounded
    * division. */
  private def kmvEstimateSql(arr: String, k: Int): String = {
    val digits = (1 to 13).map { i =>
      s"CAST(strpos('0123456789abcdef', substring($arr[$k], $i, 1)) - 1 AS DOUBLE) * ${math.pow(16, 13 - i).toLong}.0"
    }.mkString(" + ")
    s"""CASE WHEN len($arr) < $k THEN CAST(len($arr) AS DOUBLE)
       |  ELSE round(${(k - 1).toDouble} / (($digits) / 4503599627370496.0), 4) END""".stripMargin
  }

  /** One profile row (matching [[graft.operators.Profiling.profile]]) for
    * column `c` of `kind` ∈ {int, str, dbl, ts} on `table`; with `group`
    * set, one row per group value ([[Profiling.profileBy]]). */
  /** DuckDB mirror of [[graft.functions.Decimals.dmean]]: quantize at
    * `scale` through the same DECIMAL cast, sum in HUGEINT, half-up
    * integer mean `floor((2S + n)/2n)`, one final double conversion. */
  private def dmeanSql(x: String, scale: Int): String = {
    val pow = "1" + ("0" * scale)
    val s = s"SUM(CAST(CAST($x AS DECIMAL(18,$scale)) * $pow AS HUGEINT))"
    val n = s"CAST(COUNT($x) AS HUGEINT)"
    val a = s"(2 * $s + $n)"
    val b = s"(2 * $n)"
    s"CASE WHEN $n > 0 THEN CAST(($a - ((($a % $b) + $b) % $b)) // $b AS DOUBLE) / $pow.0 ELSE NULL END"
  }

  /** One unrolled PageRank iteration (the q155 oracle): mirrors
    * `Graph.pageRank`'s decimal-quantized contribution sums, dangling
    * redistribution, and 12-dp per-iteration rounding. Assumes CTEs
    * `t(src, dst, p)`, `nodes(node)`, `nc(nn)`, and `r${i-1}` exist. */
  private def prIterSql(i: Int): String = {
    val prev = s"r${i - 1}"
    // exact unscaled-integer sums with ONE double conversion + ONE
    // division, mirroring Graph.pageRank's quantized reductions
    def usum(x: String) =
      s"CAST(SUM(CAST(CAST($x AS DECIMAL(18,12)) * 1000000000000 AS HUGEINT)) AS DOUBLE) / 1000000000000.0"
    s"""c$i AS (SELECT t.dst AS node, ${usum(s"$prev.rank * t.p")} AS contrib
       |  FROM t JOIN $prev ON t.src = $prev.node GROUP BY t.dst),
       |d$i AS (SELECT COALESCE(${usum("rank")}, 0.0) AS dsum
       |  FROM $prev WHERE node NOT IN (SELECT src FROM t)),
       |r$i AS (SELECT n.node, ROUND((1.0 - 0.85) / (SELECT nn FROM nc) +
       |    0.85 * (COALESCE(c$i.contrib, 0.0) + (SELECT dsum FROM d$i) / (SELECT nn FROM nc)), 12) AS rank
       |  FROM nodes n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
  }

  private def profileColSql(table: String, c: String, kind: String, k: Int,
      group: Option[String] = None): String = {
    val gSel = group.map(g => s"$g, ").getOrElse("")
    val gBy = group.map(g => s" GROUP BY $g").getOrElse("")
    val hash = kind match {
      case "str" => c
      // DECIMAL(30,6) mirrors Profiling.hashKey's round-9 widening (a
      // (18,6) cast nulls out at |v| >= 1e12; rendering is scale-driven,
      // so in-range strings are unchanged)
      case "dbl" => s"CAST(CAST($c AS DECIMAL(30,6)) AS VARCHAR)"
      case "ts"  => s"CAST(epoch_us($c) AS VARCHAR)"
      case _     => s"CAST($c AS VARCHAR)"
    }
    val numv = kind match {
      case "str" => "CAST(NULL AS DOUBLE)"
      case "ts"  => s"CAST(epoch_us($c) AS DOUBLE)"
      case _     => s"CAST($c AS DOUBLE)"
    }
    // exact scaled-integer mean source (micro-quantized numerics, raw
    // epoch micros for timestamps) — mirrors Profiling.meanScaled
    val (meanSrc, quantum) = kind match {
      case "str" => ("CAST(NULL AS HUGEINT)", 1L)
      case "ts"  => (s"CAST(epoch_us($c) AS HUGEINT)", 1L)
      // mirrors Profiling.meanScaled's round-9 split: integrals go
      // straight to exact HUGEINT (no narrow-decimal hop that nulls out
      // at |v| >= 1e12), fractionals quantize through DECIMAL(30,6)
      case "dbl" => (s"CAST(CAST($c AS DECIMAL(30,6)) * 1000000 AS HUGEINT)", 1000000L)
      case _     => (s"CAST($c AS HUGEINT) * 1000000", 1000000L)
    }
    val (minLen, maxLen) =
      if (kind == "str") (s"CAST(min(length($c)) AS BIGINT)", s"CAST(max(length($c)) AS BIGINT)")
      else ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
    // floor((2S + n) / 2n) in exact integers = half-up mean, then one
    // small-magnitude double conversion (mirrors Profiling.profile)
    val a = "(2 * s_sum + n_nn)"
    val b = "(2 * n_nn)"
    s"""SELECT $gSel'$c' AS "column", n_rows, n_null,
       |  ${kmvEstimateSql("mins", k)} AS approx_distinct,
       |  min_val, max_val,
       |  CASE WHEN n_nn > 0 THEN
       |    CAST(($a - ((($a % $b) + $b) % $b)) // $b AS DOUBLE) / $quantum.0
       |  ELSE NULL END AS mean_val,
       |  min_len, max_len
       |FROM (SELECT ${gSel}count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  list_sort(list_distinct(list(md5($hash))))[1:$k] AS mins,
       |  min($numv) AS min_val, max($numv) AS max_val,
       |  sum($meanSrc) AS s_sum, CAST(count($c) AS HUGEINT) AS n_nn,
       |  $minLen AS min_len, $maxLen AS max_len FROM $table$gBy)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_dedup_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, $revenueSql AS revenue, o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q04_local_supplier_volume" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q07_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q08_distinct_agg" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag) AS INT) AS g1,
        | CAST(GROUPING(l_linestatus) AS INT) AS g2,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g1,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g2,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q11_setop_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q12_setop_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q14_window_frames" ->
      """SELECT event_id, user_id, value,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        | LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        | LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
        | row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY user_id, rn""".stripMargin,

    "q15_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q16_json_extract" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k,
        | CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
        | CAST(ts AS DATE) AS event_date
        |FROM events ORDER BY event_id""".stripMargin,

    "q17_ts_parse" ->
      """SELECT event_id,
        | CASE event_id % 4
        |  WHEN 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'
        |  WHEN 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
        |  WHEN 2 THEN strftime(ts, '%Y-%m-%d %H:%M:%S.') || substring(strftime(ts, '%f'), 1, 3)
        |  ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS iso,
        | CASE event_id % 4
        |  WHEN 0 THEN ts
        |  WHEN 1 THEN date_trunc('second', ts)
        |  WHEN 2 THEN date_trunc('ms', ts)
        |  ELSE date_trunc('second', ts) END AS parsed
        |FROM events ORDER BY event_id""".stripMargin,

    "q18_est_convert" ->
      """SELECT event_id,
        | strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York', '%Y-%m-%d %H:%M:%S') AS est_str,
        | (date_trunc('second', ts) AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS est_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "q19_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |source AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice * 1.1 AS DECIMAL(18,3)) AS DOUBLE) AS o_totalprice,
        |    o_orderstatus
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
        |SELECT
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderkey ELSE t.o_orderkey END AS o_orderkey,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
        | CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        | CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL THEN 'update'
        |      WHEN s.o_orderkey IS NOT NULL THEN 'insert' ELSE 'keep' END AS action
        |FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q20_retention" ->
      """SELECT event_id, ts, event_type FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        |ORDER BY event_id""".stripMargin,

    "q21_counts_filtered" ->
      """SELECT event_type, COUNT(*) AS n,
        | COUNT(CASE WHEN value > 100 THEN 1 END) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q22_text_stats" ->
      """SELECT doc_id, n_chars,
        | CAST(length(text) AS BIGINT) AS text_len,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q23_text_quality" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '),
        |   x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q25_minhash_sig" ->
      s"""WITH $shinglesCte
         |SELECT doc_id, sig_0, sig_1, sig_2, sig_3 FROM sig ORDER BY doc_id""".stripMargin,

    "q26_neardup_jaccard" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |dtoks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dt FROM documents)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  CAST(len(list_intersect(da.dt, db.dt)) AS DOUBLE)
         |    / CAST(len(list_distinct(list_concat(da.dt, db.dt))) AS DOUBLE) AS jaccard
         |FROM pairs p
         |JOIN dtoks da ON da.doc_id = p.doc_id_a
         |JOIN dtoks db ON db.doc_id = p.doc_id_b
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q67_lsh_guarded" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |sized AS (SELECT doc_id, band,
         |  COUNT(*) OVER (PARTITION BY band) AS w,
         |  MIN(doc_id) OVER (PARTITION BY band) AS anchor
         |  FROM banded)
         |SELECT DISTINCT doc_id_a, doc_id_b FROM (
         |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM sized a JOIN sized b ON a.band = b.band AND a.doc_id < b.doc_id
         |  WHERE a.w <= 2
         |  UNION ALL
         |  SELECT anchor, doc_id FROM sized WHERE w > 2 AND doc_id <> anchor)
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q27_simhash" ->
      s"""SELECT doc_id, CAST(${simhashBitsSql(16)} AS BIGINT) AS simhash
         |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q28_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_exact,
        | list_min([md5(substring(text, i, 16))
        |   FOR i IN generate_series(1, greatest(length(text) - 15, 1))]) AS fp_winnow
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q29_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    ROUND(list_dot_product(qv, cv)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
        |  FROM c, q WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q38_sliding_window" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS w_start, event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS w_start,
        |    event_type, value FROM events)
        |SELECT w_start, w_start + INTERVAL 60 MINUTES AS w_end, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q39_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 10 MINUTES
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL 10 MINUTES AS s_end, user_id,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    // The LSH planes are embedded as double literals (computed once on
    // the JVM): re-deriving them via sin() in SQL could flip a sign bit
    // on another libm and change a bucket.
    "q30_knn_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |qb AS (SELECT query_id, qv, ${bucketSql("qv")} AS bucket FROM q),
         |cb AS (SELECT neighbor_id, cv, ${bucketSql("cv")} AS bucket FROM c),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ROUND(list_dot_product(qv, cv)
         |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
         |  FROM cb JOIN qb USING (bucket) WHERE query_id <> neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
         |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q42_json_sample" ->
      """SELECT event_id,
        | '{"event_id":' || event_id || ',"event_type":"' || event_type
        |   || '","user_id":' || user_id || '}' AS js
        |FROM events ORDER BY event_id LIMIT 5""".stripMargin,

    "q43_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, l.o_orderkey, l.o_totalprice
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) l ON TRUE
        |ORDER BY e.event_id""".stripMargin,

    "q44_pivot" ->
      """SELECT o_orderstatus,
        | COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1,
        | COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2,
        | COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3,
        | COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4,
        | COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q45_percentile" ->
      """WITH ranked AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders)
        |SELECT o_orderstatus,
        | MAX(CASE WHEN rn = ceil(n * 0.5) THEN o_totalprice END) AS p50,
        | MAX(CASE WHEN rn = ceil(n * 0.9) THEN o_totalprice END) AS p90,
        | COUNT(*) AS n
        |FROM ranked GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q51_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  [array_to_string(t[i:i+1], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 1, 1))] AS s
        |  FROM toks)
        |SELECT doc_id,
        | CAST(greatest(list_max([len(list_filter(s, y -> y = x))
        |   FOR x IN list_distinct(s)]), 1) AS DOUBLE)
        |   / CAST(len(s) AS DOUBLE) AS top_bigram_frac,
        | CAST(len(list_distinct(s)) AS DOUBLE)
        |   / CAST(len(s) AS DOUBLE) AS distinct_bigram_ratio
        |FROM sh ORDER BY doc_id""".stripMargin,

    "q52_pii_scrub" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(
        |   text || ' contact user' || doc_id || '@example.com or 555-'
        |        || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-4242',
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q53_vocab" ->
      """SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token HAVING COUNT(*) >= 5
        |ORDER BY n DESC, token LIMIT 100""".stripMargin,

    "q66_from_json" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        | CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q65_date_arith" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate AS DATE) AS day,
        | CAST(o_orderdate AS DATE) + 30 AS plus_30,
        | CAST(o_orderdate AS DATE) - 30 AS minus_30,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month_clamped,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        | CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders WHERE o_orderkey <= 30000
        |ORDER BY o_orderkey""".stripMargin,

    "q64_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
        | CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q62_rank_distributions" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_orderkey <= 30000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q63_string_panel" ->
      """SELECT doc_id,
        | upper(substring(text, 1, 1)) || lower(substring(text, 2, 11)) AS title_head,
        | translate(substring(text, 1, 20), 'aeiou', '_____') AS devoweled,
        | CAST(instr(text, 'the') AS BIGINT) AS first_the,
        | lpad(CAST(doc_id AS STRING), 8, '0') AS padded_id,
        | CAST(levenshtein(substring(text, 1, 15),
        |   reverse(substring(text, 1, 15))) AS BIGINT) AS palindromicity
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q60_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey <= 1000)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q61_nested_collect" ->
      """SELECT user_id,
        | array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
        | COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q58_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(grouping(o_orderstatus) AS INT) AS g1,
        | CAST(grouping(o_orderpriority) AS INT) AS g2,
        | count(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q59_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q55_interval_join" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id, ts
        |  FROM flagged),
        |intervals AS (
        |  SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_last
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT e.event_id, e.user_id, e.ts, i.s_start, i.s_last
        |FROM events e JOIN intervals i
        |  ON e.user_id = i.user_id AND e.ts BETWEEN i.s_start AND i.s_last
        |ORDER BY event_id""".stripMargin,

    "q71_stratified_sample" ->
      """SELECT o_orderstatus, o_orderkey,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 50
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q70_quality_filter" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
        |  CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |    / CAST(len(t) AS DOUBLE) AS stopword_ratio
        |  FROM toks),
        |sh AS (SELECT doc_id, [array_to_string(t[i:i+1], ' ')
        |  FOR i IN generate_series(1, greatest(len(t) - 1, 1))] AS s FROM toks),
        |rep AS (SELECT doc_id,
        |  CAST(greatest(list_max([len(list_filter(s, y -> y = x)) FOR x IN list_distinct(s)]), 1) AS DOUBLE)
        |    / CAST(len(s) AS DOUBLE) AS top_bigram_frac FROM sh),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS v FROM freq),
        |rare AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < tt THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_frac
        |  FROM tk JOIN freq USING (token) CROSS JOIN tot GROUP BY doc_id)
        |SELECT doc_id, n_tokens, ttr, stopword_ratio, top_bigram_frac, rare_frac,
        |  (n_tokens >= 30 AND ttr >= 0.35 AND stopword_ratio >= 0.03
        |   AND top_bigram_frac < 0.08 AND rare_frac <= 0.5) AS keep
        |FROM base JOIN rep USING (doc_id) JOIN rare USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q68_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < t THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        | CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < t THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_frac,
        | min(c) AS min_cf, max(c) AS max_cf
        |FROM toks JOIN freq USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q69_dedup_corpus" ->
      s"""WITH RECURSIVE $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |e AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         |losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) < id)
         |SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // Full curation chain: stage CTEs mirror q24 (exact dedup), q69
    // (near-dup removal) and q70 (quality panel), except every
    // corpus-relative statistic is computed over the surviving set of its
    // stage, as Curation.curate does.
    "q72_curation_chain" ->
      """WITH RECURSIVE
        |keepx AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |docs AS (SELECT d.doc_id, d.text FROM documents d JOIN keepx USING (doc_id)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        |hs AS (SELECT doc_id,
        |  [md5(array_to_string(t[i:i+2], ' ')) FOR i IN generate_series(1, greatest(len(t)-2, 1))] AS h
        |  FROM toks),
        |sig AS (SELECT doc_id,
        |  list_min([substring(x, 1, 8) FOR x IN h]) AS sig_0,
        |  list_min([substring(x, 9, 8) FOR x IN h]) AS sig_1,
        |  list_min([substring(x, 17, 8) FOR x IN h]) AS sig_2,
        |  list_min([substring(x, 25, 8) FOR x IN h]) AS sig_3
        |  FROM hs),
        |banded AS (
        |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
        |  UNION ALL
        |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
        |e AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
        |losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) < id),
        |nd AS (SELECT * FROM docs WHERE doc_id NOT IN (SELECT id FROM losers)),
        |ndtoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM nd),
        |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
        |  CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |    / CAST(len(t) AS DOUBLE) AS stopword_ratio
        |  FROM ndtoks),
        |sh AS (SELECT doc_id, [array_to_string(t[i:i+1], ' ')
        |  FOR i IN generate_series(1, greatest(len(t) - 1, 1))] AS s FROM ndtoks),
        |rep AS (SELECT doc_id,
        |  CAST(greatest(list_max([len(list_filter(s, y -> y = x)) FOR x IN list_distinct(s)]), 1) AS DOUBLE)
        |    / CAST(len(s) AS DOUBLE) AS top_bigram_frac FROM sh),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM nd),
        |freq AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS v FROM freq),
        |rare AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN CAST(c AS HUGEINT) * v < tt THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_frac
        |  FROM tk JOIN freq USING (token) CROSS JOIN tot GROUP BY doc_id),
        |keepq AS (SELECT doc_id
        |  FROM base JOIN rep USING (doc_id) JOIN rare USING (doc_id)
        |  WHERE n_tokens >= 30 AND ttr >= 0.35 AND stopword_ratio >= 0.03
        |    AND top_bigram_frac < 0.08 AND rare_frac <= 0.5)
        |SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM nd WHERE doc_id IN (SELECT doc_id FROM keepq)
        |ORDER BY doc_id""".stripMargin,

    "q78_corpus_report" ->
      """WITH dc AS (SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1),
        |e AS (SELECT source, lang,
        |  len(string_split(text, ' ')) AS nt,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','an','of','and','or','to','in','is','on'))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sw,
        |  CASE WHEN n > 1 THEN 1 ELSE 0 END AS dup
        |  FROM documents JOIN dc ON md5(text) = h)
        |SELECT source, lang, count(*) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens,
        | round(avg(ttr), 6) AS mean_ttr,
        | round(avg(sw), 6) AS mean_stopword_ratio,
        | round(CAST(sum(dup) AS DOUBLE) / count(*), 6) AS dup_frac
        |FROM e GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q77_incremental_dedup" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig)
         |SELECT DISTINCT a.doc_id AS doc_id_new, b.doc_id AS doc_id_corpus
         |FROM banded a JOIN banded b ON a.band = b.band
         |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
         |ORDER BY doc_id_new, doc_id_corpus""".stripMargin,

    // Cutoffs are floor(fraction * 65536) in 4-hex-char lowercase, as
    // Relational.weightedSample computes at plan time; 'g' > every hex
    // digit = keep-all.
    "q76_domain_mixture" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN '8000'
        |    WHEN 'src2' THEN '4000' ELSE '1999' END
        |ORDER BY doc_id""".stripMargin,

    "q75_sequence_packing" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |p AS (SELECT doc_id, shard, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM d)
        |SELECT doc_id, shard, n_tokens, start_offset,
        | CAST(floor(CAST(start_offset AS DOUBLE) / 256.0) AS BIGINT) AS pack_id
        |FROM p ORDER BY doc_id""".stripMargin,

    "q74_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
        | round(log2(CAST(sum(k) AS DOUBLE))
        |   - sum(k * log2(CAST(k AS DOUBLE))) / CAST(sum(k) AS DOUBLE), 6) AS entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q79_lm_quality" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(avg(ln(c + 0.5) - ln(t + 0.5 * v)), 6) AS lm_logprob
        |FROM toks JOIN freq USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_decontaminate" -> DecontaminateOracle,

    // Bit-identical oracle to q73: the Bloom sketch is a pre-filter, not
    // an approximation, so the exact decontamination SQL IS the contract.
    "q101_decontaminate_bloom" -> DecontaminateOracle,

    "q80_simhash_pairs" ->
      s"""WITH f AS (SELECT doc_id, CAST(${simhashBitsSql(32)} AS BIGINT) AS simhash
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
         |ch AS (SELECT doc_id, simhash, i AS ci, (simhash >> (i*8)) & 255 AS cv
         |  FROM f, generate_series(0, 3) g(i)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
         |SELECT doc_id_a, doc_id_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q81_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, token, tf,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tf_idf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |ranked AS (SELECT doc_id, token, tf, tf_idf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, token) AS rnk
        |  FROM scored)
        |SELECT doc_id, CAST(rnk AS INT) AS rank, token, tf, tf_idf
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q82_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, t, n, unnest(generate_series(0,
        |    CAST(floor((greatest(n - 64, 0) + 47) / 48.0) AS BIGINT))) AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id, CAST(chunk_id * 48 + 1 AS BIGINT) AS start_token,
        | CAST(least(n - (chunk_id * 48 + 1) + 1, 64) AS BIGINT) AS n_chunk_tokens,
        | array_to_string(t[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q83_normalize_dedup" ->
      """WITH noisy AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ' ... !!!' ELSE '' END) AS noisy FROM documents),
        |norm AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |    lower(noisy), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h FROM noisy),
        |g AS (SELECT h, count(*) AS n_copies, min(doc_id) AS keeper FROM norm GROUP BY h)
        |SELECT doc_id, n_copies, CAST(doc_id = keeper AS INT) AS is_keeper
        |FROM norm JOIN g USING (h) ORDER BY doc_id""".stripMargin,

    "q84_span_dedup" ->
      s"""WITH noisy AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN '$SpanBoiler ' || text ELSE text END AS text
         |  FROM documents),
         |d AS (SELECT doc_id, string_split(text, ' ') AS t,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM noisy),
         |c AS (SELECT doc_id, t, n, unnest(generate_series(0,
         |    CAST(floor((greatest(n - 12, 0) + 11) / 12.0) AS BIGINT))) AS chunk_id
         |  FROM d),
         |spans AS (SELECT doc_id, chunk_id,
         |  array_to_string(t[(chunk_id * 12 + 1):(chunk_id * 12 + 12)], ' ') AS span
         |  FROM c),
         |k AS (SELECT span, min(doc_id * 1048576 + chunk_id) AS keep
         |  FROM spans GROUP BY span),
         |kept AS (SELECT s.doc_id, s.chunk_id, s.span FROM spans s JOIN k
         |  ON s.span = k.span AND s.doc_id * 1048576 + s.chunk_id = k.keep),
         |per AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id),
         |ka AS (SELECT doc_id, count(*) AS n_kept,
         |  string_agg(span, ' ' ORDER BY chunk_id) AS clean_text FROM kept GROUP BY doc_id)
         |SELECT p.doc_id, p.n_spans, coalesce(ka.n_kept, 0) AS n_kept,
         |  coalesce(ka.clean_text, '') AS clean_text
         |FROM per p LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin,

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

    "q86_token_budget" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS total FROM per),
        |b AS (SELECT total, total * 500000 // 1000000 AS budget FROM t),
        |a AS (SELECT source, n_docs, n_tokens,
        |    least(CAST(n_tokens AS HUGEINT), b.budget * n_tokens // b.total,
        |          b.budget * 40000 // 1000000) AS alloc
        |  FROM per CROSS JOIN b)
        |SELECT source, n_docs, n_tokens, CAST(alloc AS BIGINT) AS alloc_tokens,
        |  round(CAST(alloc AS DOUBLE) / n_tokens, 6) AS keep_ratio
        |FROM a ORDER BY source""".stripMargin,

    "q87_skew_audit" ->
      """WITH c AS (SELECT CAST(l_orderkey AS STRING) AS key, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tt, count(*) AS kk FROM c)
        |SELECT key, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / tt, 6) AS share,
        |  round(CAST(n_rows AS DOUBLE) * kk / tt, 6) AS skew_ratio,
        |  CAST((n_rows * kk + tt - 1) // tt AS BIGINT) AS salt_factor
        |FROM c CROSS JOIN t ORDER BY n_rows DESC, key LIMIT 25""".stripMargin,

    "q88_collocations" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |uni AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM d)),
        |bgc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS u,
        |               (SELECT CAST(sum(n_pair) AS BIGINT) FROM bgc) AS b)
        |SELECT w1, w2, n_pair,
        |  round(ln((CAST(n_pair AS DOUBLE) / b) /
        |    ((CAST(c1.c AS DOUBLE) / u) * (CAST(c2.c AS DOUBLE) / u))), 6) AS pmi
        |FROM bgc JOIN uni c1 ON bgc.w1 = c1.token JOIN uni c2 ON bgc.w2 = c2.token
        |CROSS JOIN tot
        |ORDER BY n_pair DESC, w1, w2 LIMIT 50""".stripMargin,

    "q89_source_overlap" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT source, g FROM (SELECT source,
        |  unnest([array_to_string(t[i:i+2], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 2, 1))]) AS g FROM d)),
        |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |ov AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) / (za.n + zb.n - n_shared), 6) AS jaccard
        |FROM ov JOIN sz za ON ov.source_a = za.source
        |        JOIN sz zb ON ov.source_b = zb.source
        |ORDER BY source_a, source_b""".stripMargin,

    "q90_length_deciles" ->
      """WITH lens AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt, doc_id FROM documents),
        |ranked AS (SELECT source, nt,
        |  row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY source) AS n FROM lens)
        |SELECT source, count(*) AS n_docs,
        |  max(CASE WHEN rn = ceil(n * 1 / 10.0) THEN nt END) AS p10,
        |  max(CASE WHEN rn = ceil(n * 2 / 10.0) THEN nt END) AS p20,
        |  max(CASE WHEN rn = ceil(n * 3 / 10.0) THEN nt END) AS p30,
        |  max(CASE WHEN rn = ceil(n * 4 / 10.0) THEN nt END) AS p40,
        |  max(CASE WHEN rn = ceil(n * 5 / 10.0) THEN nt END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 6 / 10.0) THEN nt END) AS p60,
        |  max(CASE WHEN rn = ceil(n * 7 / 10.0) THEN nt END) AS p70,
        |  max(CASE WHEN rn = ceil(n * 8 / 10.0) THEN nt END) AS p80,
        |  max(CASE WHEN rn = ceil(n * 9 / 10.0) THEN nt END) AS p90
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "q91_line_dedup" ->
      s"""WITH lined AS (SELECT doc_id,
         |  array_to_string(string_split(text, ' ')[1:10], ' ') || chr(10) ||
         |  coalesce(array_to_string(string_split(text, ' ')[11:], ' '), '') ||
         |  (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '$LineBoiler' ELSE '' END)
         |  AS text FROM documents),
         |lines AS (SELECT doc_id,
         |    unnest(string_split(text, chr(10))) AS line,
         |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
         |  FROM lined),
         |freq AS (SELECT line, count(DISTINCT doc_id) AS docs
         |  FROM lines GROUP BY line),
         |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
         |  JOIN freq f ON l.line = f.line WHERE f.docs <= 5),
         |per AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
         |ka AS (SELECT doc_id, count(*) AS n_kept,
         |  string_agg(line, chr(10) ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT p.doc_id, p.n_lines, coalesce(ka.n_kept, 0) AS n_kept,
         |  coalesce(ka.clean_text, '') AS clean_text
         |FROM per p LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q92_embedding_audit" ->
      """WITH v AS (SELECT label,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x))) AS DECIMAL(18,9)) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  min(dim) AS dim_min, max(dim) AS dim_max,
        |  CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  round(CAST(sum(nrm) AS DOUBLE) / count(*), 6) AS avg_norm
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

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

    "q128_funnel_anyorder" ->
      """WITH t0 AS (SELECT user_id, min(epoch_us(ts)) AS t0
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |fl AS (SELECT e.user_id,
        |    max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS h1,
        |    max(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS h2,
        |    max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS h3
        |  FROM events e JOIN t0 ON e.user_id = t0.user_id
        |  WHERE e.event_type IN ('view', 'click', 'purchase')
        |    AND epoch_us(e.ts) >= t0.t0
        |    AND epoch_us(e.ts) <= t0.t0 + 604800000000
        |  GROUP BY e.user_id),
        |n AS (SELECT
        |    CAST(SUM(h1) AS BIGINT) AS n1,
        |    CAST(SUM(h1 * h2) AS BIGINT) AS n2,
        |    CAST(SUM(h1 * h2 * h3) AS BIGINT) AS n3
        |  FROM fl)
        |SELECT step, step_name, n_keys,
        |  round(CAST(n_keys AS DOUBLE) /
        |    (SELECT n1 FROM n), 6) AS conversion
        |FROM (
        |  SELECT 1 AS step, 'view' AS step_name, n1 AS n_keys FROM n
        |  UNION ALL SELECT 2, 'click', n2 FROM n
        |  UNION ALL SELECT 3, 'purchase', n3 FROM n)
        |ORDER BY step""".stripMargin,

    "q94_funnel" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t0
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(s1.t0) AS t0, min(epoch_us(e.ts)) AS tp
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t0
        |    AND epoch_us(e.ts) <= s1.t0 + 604800000000
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(s2.t0) AS t0, min(epoch_us(e.ts)) AS tp
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.tp
        |    AND epoch_us(e.ts) <= s2.t0 + 604800000000
        |  GROUP BY e.user_id),
        |counts AS (
        |  SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS n_keys
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT count(*) FROM s3)),
        |base AS (SELECT n_keys AS b FROM counts WHERE step = 1)
        |SELECT step, step_name, n_keys,
        |  round(CAST(n_keys AS DOUBLE) / b, 6) AS conversion
        |FROM counts CROSS JOIN base ORDER BY step""".stripMargin,

    "q95_cohort_retention" ->
      """WITH wk AS (SELECT user_id,
        |    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w FROM events),
        |cohorts AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, w FROM wk),
        |sizes AS (SELECT cohort_week, count(*) AS sz FROM cohorts GROUP BY cohort_week)
        |SELECT c.cohort_week AS cohort_week, a.w - c.cohort_week AS week_offset,
        |  count(*) AS n_active,
        |  round(CAST(count(*) AS DOUBLE) / max(s.sz), 6) AS retention
        |FROM active a JOIN cohorts c ON a.user_id = c.user_id
        |JOIN sizes s ON s.cohort_week = c.cohort_week
        |GROUP BY c.cohort_week, a.w - c.cohort_week
        |ORDER BY 1, 2""".stripMargin,

    "q96_winnowing" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, [md5(array_to_string(t[i:i+2], ' '))
        |  FOR i IN generate_series(1, greatest(len(t) - 2, 1))] AS gh FROM d)
        |SELECT DISTINCT doc_id,
        |  unnest([list_min(gh[i:i+3])
        |    FOR i IN generate_series(1, greatest(len(gh) - 3, 1))]) AS fingerprint
        |FROM g ORDER BY doc_id, fingerprint""".stripMargin,

    "q97_ngram_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, md5(g) AS h FROM (SELECT doc_id,
        |  unnest(list_distinct([array_to_string(t[i:i+2], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 2, 1))])) AS g FROM d)),
        |first AS (SELECT h, min(doc_id) AS fst FROM grams GROUP BY h)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN g.doc_id = f.fst THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN g.doc_id = f.fst THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty_ratio
        |FROM grams g JOIN first f ON g.h = f.h
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "q98_length_outliers" ->
      """WITH lens AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt, doc_id FROM documents),
        |r1 AS (SELECT source, nt, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM lens),
        |med AS (SELECT source, nt AS med FROM r1 WHERE rn = ceil(n / 2.0)),
        |dev AS (SELECT l.source, abs(l.nt - m.med) AS ad, l.doc_id, m.med
        |  FROM lens l JOIN med m USING (source)),
        |r2 AS (SELECT source, ad, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY ad, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM dev),
        |mad AS (SELECT source, ad AS mad FROM r2 WHERE rn = ceil(n / 2.0))
        |SELECT d.source, count(*) AS n_docs, max(d.med) AS median_tokens,
        |  max(md.mad) AS mad_tokens,
        |  CAST(sum(CASE WHEN d.ad > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad md USING (source)
        |GROUP BY d.source ORDER BY source""".stripMargin,

    "q99_shard_audit" ->
      """WITH s AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8
        |      AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w FROM documents),
        |per AS (SELECT shard, count(*) AS n_rows,
        |    CAST(sum(w) AS BIGINT) AS weight_sum FROM s GROUP BY shard),
        |t AS (SELECT CAST(sum(weight_sum) AS BIGINT) AS tt, count(*) AS kk FROM per)
        |SELECT shard, n_rows, weight_sum,
        |  round(CAST(weight_sum AS DOUBLE) * kk / tt, 6) AS skew_ratio
        |FROM per CROSS JOIN t ORDER BY shard""".stripMargin,

    "q100_cell_balance" ->
      """WITH c AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 10),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |scored AS (SELECT vec_id, cell,
        |  round(list_dot_product(vv, cv)
        |    / (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(cv, cv))), 6)
        |    AS cos
        |  FROM v CROSS JOIN c),
        |assigned AS (SELECT cell, CAST(cos AS DECIMAL(18,9)) AS cosd FROM (
        |  SELECT vec_id, cell, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |  FROM scored) WHERE rn = 1),
        |t AS (SELECT count(*) AS total FROM embeddings)
        |SELECT cell, count(*) AS n_vecs,
        |  round(CAST(count(*) AS DOUBLE) / max(t.total), 6) AS share,
        |  round(CAST(sum(cosd) AS DOUBLE) / count(*), 6) AS mean_cos
        |FROM assigned CROSS JOIN t GROUP BY cell ORDER BY cell""".stripMargin,

    "q104_label_agreement" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec, label
        |           FROM embeddings),
        |p AS (SELECT * FROM v WHERE vec_id < 50),
        |scored AS (
        |  SELECT p.vec_id AS qid, p.label AS own, v.label AS nl,
        |    ROUND(list_dot_product(p.vec, v.vec)
        |      / (sqrt(list_dot_product(p.vec, p.vec))
        |         * sqrt(list_dot_product(v.vec, v.vec))), 6) AS cosine,
        |    v.vec_id AS nid
        |  FROM p JOIN v ON v.vec_id <> p.vec_id),
        |topk AS (SELECT * FROM (
        |  SELECT qid, own, nl,
        |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |  FROM scored) WHERE rn <= 5),
        |votes AS (SELECT qid, own, nl, count(*) AS nv, min(rn) AS best
        |  FROM topk GROUP BY 1, 2, 3),
        |win AS (SELECT qid, own, nl FROM (
        |  SELECT qid, own, nl,
        |    row_number() OVER (PARTITION BY qid ORDER BY nv DESC, best ASC, nl ASC) AS vr
        |  FROM votes) WHERE vr = 1)
        |SELECT own AS label, count(*) AS n_probes,
        |  CAST(sum(CASE WHEN nl = own THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        |  round(CAST(sum(CASE WHEN nl = own THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS agreement
        |FROM win GROUP BY own ORDER BY own""".stripMargin,

    "q103_source_divergence" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |ns AS (SELECT source, sum(c) AS ns FROM c GROUP BY 1),
        |nw AS (SELECT token, sum(c) AS nw FROM c GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM c)
        |SELECT c.source, CAST(max(ns.ns) AS BIGINT) AS n_tokens,
        |  count(*) AS n_vocab,
        |  round(sum((CAST(c.c AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |    * ln((CAST(c.c AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |        / (CAST(nw.nw AS DOUBLE) / CAST(n.n AS DOUBLE)))), 6) AS kl_nats
        |FROM c JOIN ns USING (source) JOIN nw USING (token) CROSS JOIN n
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "q105_oov_rate" ->
      """WITH c AS (
        |  SELECT source, token, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY source, token),
        |nw AS (SELECT token, sum(c) AS nw FROM c GROUP BY token)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN nw < 5 THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(sum(CASE WHEN nw < 5 THEN 1 ELSE 0 END) AS BIGINT) AS oov_types,
        |  round(CAST(sum(CASE WHEN nw < 5 THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS oov_rate
        |FROM c JOIN nw USING (token)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q107_stratified_split" ->
      """WITH a AS (SELECT source,
        |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split,
        |  len(string_split(text, ' ')) AS nt
        |  FROM documents)
        |SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  round(CAST(count(*) AS DOUBLE)
        |    / sum(count(*)) OVER (PARTITION BY source), 6) AS doc_share
        |FROM a GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q108_gopher_rules" ->
      """WITH f AS (SELECT source,
        |  len(string_split(text, ' ')) BETWEEN 20 AND 80 AS rw,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE)
        |    BETWEEN 3.0 AND 4.5 AS rm,
        |  len(list_distinct(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','an','of','and','or','to','in','is','on')))) >= 2 AS rs
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rw THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_words,
        |  CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_meanlen,
        |  CAST(sum(CASE WHEN rs THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stopwords,
        |  CAST(sum(CASE WHEN rw AND rm AND rs THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
        |  round(CAST(sum(CASE WHEN rw AND rm AND rs THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS pass_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q109_containment" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |grams AS (SELECT doc_id,
         |  list_distinct([array_to_string(t[i:i+2], ' ')
         |    FOR i IN generate_series(1, greatest(len(t) - 2, 1))]) AS g
         |  FROM toks)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |    / CAST(len(ga.g) AS DOUBLE) AS containment_a,
         |  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |    / CAST(len(gb.g) AS DOUBLE) AS containment_b,
         |  greatest(
         |    CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |      / CAST(len(ga.g) AS DOUBLE),
         |    CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |      / CAST(len(gb.g) AS DOUBLE)) AS max_containment
         |FROM pairs p
         |JOIN grams ga ON ga.doc_id = p.doc_id_a
         |JOIN grams gb ON gb.doc_id = p.doc_id_b
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q110_zipf_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |hist AS (SELECT c, count(*) AS nt FROM c GROUP BY c),
        |w AS (SELECT c, nt,
        |  sum(c * nt) OVER (ORDER BY c DESC) AS cumtok,
        |  sum(nt) OVER (ORDER BY c DESC) AS cumtyp FROM hist),
        |tot AS (SELECT sum(c * nt) AS tt, sum(nt) AS ty FROM hist),
        |th AS (SELECT unnest([500000, 900000, 990000]) AS ppm),
        |cand AS (SELECT ppm, c, nt, cumtok, cumtyp, tt, ty,
        |    (tt * ppm + 999999) // 1000000 AS target,
        |    row_number() OVER (PARTITION BY ppm ORDER BY cumtyp) AS rn
        |  FROM th CROSS JOIN w CROSS JOIN tot
        |  WHERE cumtok >= (tt * ppm + 999999) // 1000000)
        |SELECT CAST(ppm AS BIGINT) AS threshold_ppm,
        |  CAST(target AS BIGINT) AS target_tokens,
        |  CAST(cumtyp - nt
        |    + (target - (cumtok - c * nt) + c - 1) // c AS BIGINT) AS n_types,
        |  CAST(ty AS BIGINT) AS total_types,
        |  CAST(tt AS BIGINT) AS total_tokens
        |FROM cand WHERE rn = 1 ORDER BY threshold_ppm""".stripMargin,

    "q117_funnel_latency" ->
      """WITH f AS (SELECT user_id,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |      WHEN 'purchase' THEN 2 END AS si,
        |    min(ts) AS t
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1, 2),
        |p AS (SELECT user_id, si, t,
        |    lead(si) OVER w AS nsi, lead(t) OVER w AS nt
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY si)),
        |l AS (SELECT si, date_diff('second', t, nt) AS lat
        |  FROM p WHERE nsi = si + 1 AND nt >= t),
        |h AS (SELECT si, lat, count(*) AS c FROM l GROUP BY 1, 2),
        |cum AS (SELECT si, lat, c,
        |    sum(c) OVER (PARTITION BY si ORDER BY lat) AS cm,
        |    sum(c) OVER (PARTITION BY si) AS n,
        |    sum(lat * c) OVER (PARTITION BY si) AS s
        |  FROM h),
        |agg AS (SELECT si, max(n) AS n_users,
        |    round(CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |      AS mean_latency_s,
        |    CAST(min(lat) AS BIGINT) AS median_latency_s
        |  FROM cum WHERE cm >= ceil(n / 2.0) GROUP BY si)
        |SELECT CASE si WHEN 0 THEN 'view' WHEN 1 THEN 'click' END AS step_from,
        |  CASE si WHEN 0 THEN 'click' WHEN 1 THEN 'purchase' END AS step_to,
        |  CAST(n_users AS BIGINT) AS n_users, mean_latency_s, median_latency_s
        |FROM agg ORDER BY step_from""".stripMargin,

    "q118_cooc_ppmi" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT unnest(flatten([[ [least(t[i], t[i+j]), greatest(t[i], t[i+j])]
        |    FOR i IN generate_series(1, len(t) - j)] FOR j IN generate_series(1, 3)])) AS pr
        |  FROM d),
        |pc AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n_pair
        |  FROM p GROUP BY 1, 2),
        |toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS u,
        |               (SELECT CAST(sum(n_pair) AS BIGINT) FROM pc) AS b),
        |top AS (SELECT * FROM pc ORDER BY n_pair DESC, w1, w2 LIMIT 50)
        |SELECT w1, w2, n_pair,
        |  round(greatest(0.0, ln((CAST(n_pair AS DOUBLE) / b) /
        |    ((CAST(c1.c AS DOUBLE) / u) * (CAST(c2.c AS DOUBLE) / u)))), 6) AS ppmi
        |FROM top JOIN uni c1 ON top.w1 = c1.w JOIN uni c2 ON top.w2 = c2.w
        |CROSS JOIN tot ORDER BY n_pair DESC, w1, w2""".stripMargin,

    "q119_weighted_sample" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
        |  round(pow(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0,
        |    1.0 / len(string_split(text, ' '))), 6) AS priority
        |FROM documents ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,

    "q120_nfc_audit" ->
      """WITH fx AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' cafe' || chr(769)
        |         ELSE text END AS text
        |  FROM documents),
        |n AS (SELECT source, text, nfc_normalize(text) AS nt FROM fx)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_denorm,
        |  CAST(sum(length(text) - length(nt)) AS BIGINT) AS chars_saved,
        |  round(CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS denorm_pct
        |FROM n GROUP BY source ORDER BY source""".stripMargin,

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

    "q127_entry_conversion" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS sid
        |  FROM o),
        |e AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |    ORDER BY ts, event_id) AS rn
        |  FROM s),
        |g AS (SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM e GROUP BY 1, 2)
        |SELECT entry_type,
        |  count(*) AS n_sessions,
        |  CAST(sum(conv) AS BIGINT) AS n_converted,
        |  round(CAST(sum(conv) AS DOUBLE) / count(*), 6) AS conversion
        |FROM g GROUP BY entry_type ORDER BY entry_type""".stripMargin,

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

    "q113_label_separation" ->
      """WITH v AS (SELECT vec_id, label,
        |    unnest(range(1, len(embedding) + 1)) AS i,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |cs AS (SELECT label, i, sum(x) AS s FROM v GROUP BY label, i),
        |cn AS (SELECT label, sum(s * s) AS n2 FROM cs GROUP BY label),
        |dots AS (SELECT a.label AS la, b.label AS lb, sum(a.s * b.s) AS dot
        |  FROM cs a JOIN cs b ON a.i = b.i AND a.label <> b.label
        |  GROUP BY 1, 2),
        |near AS (SELECT la, lb, c FROM (
        |  SELECT la, lb, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS c,
        |    row_number() OVER (PARTITION BY la
        |      ORDER BY dot / (sqrt(na.n2) * sqrt(nb.n2)) DESC, lb) AS rn
        |  FROM dots JOIN cn na ON na.label = dots.la
        |            JOIN cn nb ON nb.label = dots.lb) WHERE rn = 1),
        |dv AS (SELECT v.label, v.vec_id,
        |    sum(v.x * cs.s) AS dot, sum(v.x * v.x) AS vn2
        |  FROM v JOIN cs ON cs.label = v.label AND cs.i = v.i
        |  GROUP BY 1, 2 HAVING sum(v.x * v.x) > 0),
        |coh AS (SELECT dv.label, count(*) AS n_vecs,
        |    avg(dot / (sqrt(vn2) * sqrt(cn.n2))) AS m
        |  FROM dv JOIN cn ON cn.label = dv.label GROUP BY dv.label)
        |SELECT coh.label, n_vecs, round(m, 6) AS cohesion,
        |  near.lb AS nearest_label, round(near.c, 6) AS nearest_cos
        |FROM coh JOIN near ON near.la = coh.label
        |ORDER BY label""".stripMargin,

    "q111_split_leakage" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |sp AS (SELECT doc_id_a, doc_id_b,
         |  CASE WHEN (doc_id_a * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
         |       WHEN (doc_id_a * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS sa,
         |  CASE WHEN (doc_id_b * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
         |       WHEN (doc_id_b * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS sb
         |  FROM pairs)
         |SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
         |  count(*) AS n_pairs, least(sa, sb) <> greatest(sa, sb) AS is_leak
         |FROM sp GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin,

    "q112_dedup_impact" ->
      s"""WITH RECURSIVE $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |e AS (SELECT a AS src, b AS dst FROM pairs
         |      UNION SELECT b, a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         |losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN l.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  CAST(sum(CASE WHEN l.id IS NOT NULL
         |    THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
         |    AS tokens_removed,
         |  round(CAST(sum(CASE WHEN l.id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 6) AS removal_rate
         |FROM documents d LEFT JOIN losers l ON l.id = d.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,

    "q102_edit_verify" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |dt AS (SELECT doc_id, substring(text, 1, 200) AS t FROM documents)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  levenshtein(da.t, db.t) AS edit_distance,
         |  round(1 - CAST(levenshtein(da.t, db.t) AS DOUBLE)
         |    / greatest(len(da.t), len(db.t), 1), 6) AS edit_sim
         |FROM pairs p
         |JOIN dt da ON da.doc_id = p.doc_id_a
         |JOIN dt db ON db.doc_id = p.doc_id_b
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q54_dup_clusters" ->
      s"""WITH RECURSIVE $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |e AS (SELECT a AS src, b AS dst FROM pairs
         |      UNION SELECT b, a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst)
         |SELECT id AS doc_id, min(r) AS cluster, min(r) = id AS is_keeper
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "q46_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |grams AS (SELECT doc_id,
         |  list_distinct([substring(text, i, 3)
         |    FOR i IN generate_series(1, greatest(length(text) - 2, 1))]) AS g
         |  FROM documents)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         |    / CAST(len(list_distinct(list_concat(ga.g, gb.g))) AS DOUBLE) AS jaccard
         |FROM pairs p
         |JOIN grams ga ON ga.doc_id = p.doc_id_a
         |JOIN grams gb ON gb.doc_id = p.doc_id_b
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q47_topk_per_group" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q48_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n,
        | MIN(ts) AS s_start, MAX(ts) AS s_last,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q49_hash_sample" ->
      """SELECT o_orderstatus, COUNT(*) AS n_sampled,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS STRING)), 1, 2) < '1a'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q50_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | o_orderdate AS effective_from,
        | lead(o_orderdate) OVER w AS effective_to,
        | (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, effective_from, o_orderkey""".stripMargin,

    "q40_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
         |  ${bucketSql("v")} AS bucket FROM e)
         |SELECT a.vec_id AS vec_id_a, bb.vec_id AS vec_id_b,
         |  ROUND(list_dot_product(a.v, bb.v) / (a.n * bb.n), 6) AS cosine
         |FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
         |WHERE ROUND(list_dot_product(a.v, bb.v) / (a.n * bb.n), 6) >= 0.3
         |ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "q41_knn_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent, v AS cv, n AS cn FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id, v, n, cent,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ROUND(list_dot_product(v, cv) / (n * cn), 6) DESC, cent) AS rn
        |  FROM e CROSS JOIN c),
        |cells AS (SELECT vec_id AS neighbor_id, v AS nv, n AS nn, cent
        |  FROM assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, n AS qn, cent
        |  FROM assign WHERE vec_id < 5 AND rn <= 2),
        |scored AS (SELECT DISTINCT query_id, neighbor_id,
        |    ROUND(list_dot_product(qv, nv) / (qn * nn), 6) AS cosine
        |  FROM cells JOIN probes USING (cent) WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

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

    // identical program to q41 — the Spark side answers from the DISK
    // cell-partitioned index, which must change nothing about the answer
    "q154_ivf_partitioned" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent, v AS cv, n AS cn FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id, v, n, cent,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ROUND(list_dot_product(v, cv) / (n * cn), 6) DESC, cent) AS rn
        |  FROM e CROSS JOIN c),
        |cells AS (SELECT vec_id AS neighbor_id, v AS nv, n AS nn, cent
        |  FROM assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, n AS qn, cent
        |  FROM assign WHERE vec_id < 5 AND rn <= 2),
        |scored AS (SELECT DISTINCT query_id, neighbor_id,
        |    ROUND(list_dot_product(qv, nv) / (qn * nn), 6) AS cosine
        |  FROM cells JOIN probes USING (cent) WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q145_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent, v AS cv, n AS cn FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id, v, n, cent,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ROUND(list_dot_product(v, cv) / (n * cn), 6) DESC, cent) AS rn
        |  FROM e CROSS JOIN c),
        |cells AS (SELECT vec_id AS neighbor_id, v AS nv, n AS nn, cent
        |  FROM assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, v AS qv, n AS qn, cent
        |  FROM assign WHERE vec_id < 5 AND rn <= 2),
        |banded AS (SELECT DISTINCT query_id, neighbor_id,
        |    ROUND(list_dot_product(qv, nv) / (qn * nn), 6) AS cosine
        |  FROM cells JOIN probes USING (cent) WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM banded WHERE cosine >= 0.0 AND cosine < 0.9)
        |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q146_int8_quantize" ->
      s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT label, v, list_min(v) AS vmin,
         |  (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
         |r AS (SELECT label, scale, v,
         |    list_transform(v, x -> CASE WHEN scale = 0 THEN vmin
         |      ELSE vmin + LEAST(GREATEST(floor((x - vmin) / scale + 0.5), 0), 255) * scale END) AS vq
         |  FROM p),
         |s AS (SELECT label, scale * 255.0 AS rng, list_dot_product(v, v) AS dxx,
         |    list_dot_product(v, vq) AS dxy, list_dot_product(vq, vq) AS dyy,
         |    len(v) AS dim FROM r),
         |mrow AS (SELECT label, rng, (dxx - 2 * dxy + dyy) / dim AS mse,
         |    CASE WHEN dxx > 0 AND dyy > 0 THEN dxy / sqrt(dxx * dyy) END AS cos FROM s)
         |SELECT label, COUNT(*) AS n_vecs,
         |  ${dmeanSql("rng", 6)} AS avg_range,
         |  ${dmeanSql("mse", 12)} AS avg_mse,
         |  ${dmeanSql("cos", 9)} AS avg_cosine
         |FROM mrow GROUP BY label ORDER BY label""".stripMargin,

    "q147_pq_codes" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, CAST(t.ss AS INT) AS subspace,
         |    v[(CAST(t.ss AS INT) * (len(v) // 4) + 1):(CAST(t.ss AS INT) * (len(v) // 4) + (len(v) // 4))] AS sv
         |  FROM e, range(0, 4) t(ss)),
         |cb AS (SELECT subspace, vec_id AS cent, sv AS cv,
         |    list_dot_product(sv, sv) AS dcc FROM sub WHERE vec_id < 8),
         |scored AS (SELECT s.vec_id, s.subspace, cb.cent,
         |    ROUND(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv) + cb.dcc, 6) AS dist2
         |  FROM sub s JOIN cb USING (subspace)),
         |a AS (SELECT vec_id, subspace, cent, dist2,
         |    row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist2, cent) AS rn
         |  FROM scored)
         |SELECT subspace, cent AS code, COUNT(*) AS n_vecs,
         |  ${dmeanSql("dist2", 6)} AS avg_dist2
         |FROM a WHERE rn = 1 GROUP BY subspace, cent ORDER BY subspace, code""".stripMargin,

    "q148_ivf_append" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent, v AS cv, n AS cn FROM e
        |  WHERE vec_id < 10 AND vec_id % 5 <> 0),
        |assign AS (SELECT vec_id, cent,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY ROUND(list_dot_product(v, cv) / (n * cn), 6) DESC, cent) AS rn
        |  FROM e CROSS JOIN c)
        |SELECT cent AS cell, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_appended
        |FROM assign WHERE rn = 1 GROUP BY cent ORDER BY cell""".stripMargin,

    "q149_pq_adc" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, CAST(t.ss AS INT) AS subspace,
        |    v[(CAST(t.ss AS INT) * (len(v) // 4) + 1):(CAST(t.ss AS INT) * (len(v) // 4) + (len(v) // 4))] AS sv
        |  FROM e, range(0, 4) t(ss)),
        |cb AS (SELECT subspace, vec_id AS cent, sv AS cv,
        |    list_dot_product(sv, sv) AS dcc FROM sub WHERE vec_id < 8),
        |scored AS (SELECT s.vec_id, s.subspace, cb.cent,
        |    ROUND(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv) + cb.dcc, 6) AS dist2
        |  FROM sub s JOIN cb USING (subspace)),
        |a AS (SELECT vec_id, subspace, cent, dist2,
        |    row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist2, cent) AS rn
        |  FROM scored),
        |codes AS (SELECT vec_id AS id, subspace, cent AS code FROM a WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, subspace, sv AS qs,
        |    list_dot_product(sv, sv) AS dqq FROM sub WHERE vec_id < 5),
        |tbl AS (SELECT q.query_id, cb.subspace, cb.cent,
        |    ROUND(q.dqq - 2 * list_dot_product(q.qs, cb.cv) + cb.dcc, 6) AS comp
        |  FROM q JOIN cb ON q.subspace = cb.subspace),
        |sc AS (SELECT tbl.query_id, codes.id AS neighbor_id,
        |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist
        |  FROM codes JOIN tbl ON codes.subspace = tbl.subspace AND codes.code = tbl.cent
        |  WHERE codes.id <> tbl.query_id
        |  GROUP BY tbl.query_id, codes.id),
        |rk AS (SELECT query_id, neighbor_id, adc_dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rnk
        |  FROM sc)
        |SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS INT) AS rank
        |FROM rk WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q150_pq_refined" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, CAST(t.ss AS INT) AS subspace,
         |    v[(CAST(t.ss AS INT) * (len(v) // 4) + 1):(CAST(t.ss AS INT) * (len(v) // 4) + (len(v) // 4))] AS sv
         |  FROM e, range(0, 4) t(ss)),
         |cb AS (SELECT subspace, vec_id AS cent, sv AS cv,
         |    list_dot_product(sv, sv) AS dcc FROM sub WHERE vec_id < 8),
         |s1 AS (SELECT s.vec_id, s.subspace, s.sv, cb.cent,
         |    ROUND(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv) + cb.dcc, 6) AS dist2
         |  FROM sub s JOIN cb USING (subspace)),
         |a1 AS (SELECT vec_id, subspace, sv, cent FROM (
         |    SELECT vec_id, subspace, sv, cent,
         |      row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist2, cent) AS rn
         |    FROM s1) WHERE rn = 1),
         |pos0 AS (SELECT subspace, cent, sv,
         |    CAST(unnest(range(len(sv))) AS INT) AS p FROM a1),
         |pos AS (SELECT subspace, cent, p, sv[p + 1] AS x FROM pos0),
         |pm AS (SELECT subspace, cent, p, ${dmeanSql("x", 9)} AS mx
         |  FROM pos GROUP BY subspace, cent, p),
         |mv AS (SELECT subspace, cent, list(mx ORDER BY p) AS cv2
         |  FROM pm GROUP BY subspace, cent),
         |cb2 AS (SELECT cb.subspace, cb.cent, COALESCE(mv.cv2, cb.cv) AS cv,
         |    list_dot_product(COALESCE(mv.cv2, cb.cv), COALESCE(mv.cv2, cb.cv)) AS dcc
         |  FROM cb LEFT JOIN mv ON cb.subspace = mv.subspace AND cb.cent = mv.cent),
         |s2 AS (SELECT s.vec_id, s.subspace, cb2.cent,
         |    ROUND(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb2.cv) + cb2.dcc, 6) AS dist2
         |  FROM sub s JOIN cb2 ON s.subspace = cb2.subspace),
         |a2 AS (SELECT vec_id, subspace, cent, dist2,
         |    row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist2, cent) AS rn
         |  FROM s2)
         |SELECT subspace, cent AS code, COUNT(*) AS n_vecs,
         |  ${dmeanSql("dist2", 6)} AS avg_dist2
         |FROM a2 WHERE rn = 1 GROUP BY subspace, cent ORDER BY subspace, code""".stripMargin,

    "q151_pq_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ql AS (SELECT vec_id AS query_id, v AS qv, list_dot_product(v, v) AS dqq
        |  FROM e WHERE vec_id < 5),
        |x AS (SELECT query_id, e.vec_id AS neighbor_id,
        |    ROUND(dqq - 2 * list_dot_product(qv, e.v) + list_dot_product(e.v, e.v), 6) AS dist2
        |  FROM e, ql WHERE query_id <> e.vec_id),
        |exact AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY dist2, neighbor_id) AS rnk
        |    FROM x) WHERE rnk <= 10),
        |sub AS (SELECT vec_id, CAST(t.ss AS INT) AS subspace,
        |    v[(CAST(t.ss AS INT) * (len(v) // 4) + 1):(CAST(t.ss AS INT) * (len(v) // 4) + (len(v) // 4))] AS sv
        |  FROM e, range(0, 4) t(ss)),
        |cb AS (SELECT subspace, vec_id AS cent, sv AS cv,
        |    list_dot_product(sv, sv) AS dcc FROM sub WHERE vec_id < 8),
        |scored AS (SELECT s.vec_id, s.subspace, cb.cent,
        |    ROUND(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, cb.cv) + cb.dcc, 6) AS dist2
        |  FROM sub s JOIN cb USING (subspace)),
        |a AS (SELECT vec_id, subspace, cent, dist2,
        |    row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist2, cent) AS rn
        |  FROM scored),
        |codes AS (SELECT vec_id AS id, subspace, cent AS code FROM a WHERE rn = 1),
        |qs AS (SELECT vec_id AS query_id, subspace, sv AS qsv,
        |    list_dot_product(sv, sv) AS dqq2 FROM sub WHERE vec_id < 5),
        |tbl AS (SELECT qs.query_id, cb.subspace, cb.cent,
        |    ROUND(qs.dqq2 - 2 * list_dot_product(qs.qsv, cb.cv) + cb.dcc, 6) AS comp
        |  FROM qs JOIN cb ON qs.subspace = cb.subspace),
        |sc AS (SELECT tbl.query_id, codes.id AS neighbor_id,
        |    CAST(SUM(CAST(comp AS DECIMAL(18,6))) AS DOUBLE) AS adc
        |  FROM codes JOIN tbl ON codes.subspace = tbl.subspace AND codes.code = tbl.cent
        |  WHERE codes.id <> tbl.query_id GROUP BY tbl.query_id, codes.id),
        |approx AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rnk
        |    FROM sc) WHERE rnk <= 10)
        |SELECT e2.query_id, count(*) AS n_exact,
        |  CAST(sum(CASE WHEN a2.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN a2.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS recall
        |FROM exact e2 LEFT JOIN approx a2
        |  ON e2.query_id = a2.query_id AND e2.neighbor_id = a2.neighbor_id
        |GROUP BY e2.query_id ORDER BY e2.query_id""".stripMargin,

    "q152_span_corruption" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sp0 AS (SELECT doc_id, t,
        |    CAST(unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT))) AS INT) AS si
        |  FROM d),
        |sp AS (SELECT doc_id, si,
        |    t[(si * 3 + 1):(si * 3 + 3)] AS span,
        |    ((doc_id * 2654435761 + si) % 5) = 0 AS masked
        |  FROM sp0),
        |mk AS (SELECT doc_id, si, span, masked,
        |    SUM(CASE WHEN masked THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        |      ORDER BY si ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS k
        |  FROM sp),
        |pc AS (SELECT doc_id, si, masked,
        |    CASE WHEN masked THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
        |         ELSE array_to_string(span, ' ') END AS piece,
        |    CASE WHEN masked
        |         THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || array_to_string(span, ' ')
        |    END AS tgt
        |  FROM mk)
        |SELECT doc_id,
        |  string_agg(piece, ' ' ORDER BY si) AS input_text,
        |  COALESCE(string_agg(tgt, ' ' ORDER BY si), '') AS target_text,
        |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
        |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q157_ict_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id,
        |    array_to_string(t[1:CAST(ceil(len(t) / 2.0) AS INT)], ' ') AS anchor,
        |    array_to_string(t[CAST(ceil(len(t) / 2.0) AS INT) + 1:len(t)], ' ') AS positive,
        |    (doc_id * 2654435761) % 64 AS bucket,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM d)
        |SELECT doc_id, anchor, positive,
        |  COALESCE(lead(doc_id) OVER (PARTITION BY bucket ORDER BY ord, doc_id),
        |    first_value(doc_id) OVER (PARTITION BY bucket ORDER BY ord, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS neg_doc_id
        |FROM s ORDER BY doc_id""".stripMargin,

    "q158_skipgram" ->
      """WITH b AS (SELECT event_type,
        |    lag(event_type, 2) OVER w AS m2, lag(event_type, 1) OVER w AS m1,
        |    lead(event_type, 1) OVER w AS p1, lead(event_type, 2) OVER w AS p2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |u AS (
        |  SELECT event_type AS center, -2 AS rp, m2 AS context FROM b
        |  UNION ALL SELECT event_type, -1, m1 FROM b
        |  UNION ALL SELECT event_type, 1, p1 FROM b
        |  UNION ALL SELECT event_type, 2, p2 FROM b)
        |SELECT center, context, CAST(rp AS INT) AS rel_pos, count(*) AS n
        |FROM u WHERE context IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY center, context, rel_pos""".stripMargin,

    "q159_similarity_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,
        |  unnest([array_to_string(t[i:i+2], ' ')
        |    FOR i IN generate_series(1, greatest(len(t) - 2, 1))]) AS g FROM d)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |ov AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia AS doc_id_a, ib AS doc_id_b,
        |  CAST(inter AS BIGINT) AS n_shared,
        |  round(CAST(inter AS DOUBLE) / (za.n + zb.n - inter), 6) AS jaccard
        |FROM ov JOIN sz za ON ia = za.doc_id JOIN sz zb ON ib = zb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.5
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q160_target_encode" ->
      """WITH g AS (SELECT o_orderpriority AS cat,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
        |    COUNT(o_totalprice) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ts,
        |    COUNT(o_totalprice) AS tn FROM orders)
        |SELECT o.o_orderkey, o.o_orderpriority, g.n AS n_cat,
        |  round((CAST(g.s - CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |      + 10.0 * (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)))
        |    / (CAST(g.n AS DOUBLE) - 1.0 + 10.0), 6) AS loo_enc
        |FROM orders o LEFT JOIN g ON o.o_orderpriority = g.cat CROSS JOIN t
        |ORDER BY o_orderkey""".stripMargin,

    "q161_feature_scale" ->
      """WITH q AS (SELECT l_orderkey, l_linenumber,
        |    l_quantity, l_extendedprice, l_discount,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS q1,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS q2,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS HUGEINT) AS q3
        |  FROM lineitem),
        |st AS (SELECT
        |    SUM(q1) AS s1, SUM(q1*q1) AS ss1, COUNT(l_quantity) AS n1,
        |    MIN(l_quantity) AS mn1, MAX(l_quantity) AS mx1,
        |    SUM(q2) AS s2, SUM(q2*q2) AS ss2, COUNT(l_extendedprice) AS n2,
        |    MIN(l_extendedprice) AS mn2, MAX(l_extendedprice) AS mx2,
        |    SUM(q3) AS s3, SUM(q3*q3) AS ss3, COUNT(l_discount) AS n3,
        |    MIN(l_discount) AS mn3, MAX(l_discount) AS mx3
        |  FROM q),
        |st2 AS (SELECT *,
        |    CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)/100.0 AS mean1,
        |    sqrt(CAST(n1*ss1 - s1*s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
        |      /CAST(n1 AS DOUBLE))/100.0 AS std1,
        |    CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)/100.0 AS mean2,
        |    sqrt(CAST(n2*ss2 - s2*s2 AS DOUBLE)/CAST(n2 AS DOUBLE)
        |      /CAST(n2 AS DOUBLE))/100.0 AS std2,
        |    CAST(s3 AS DOUBLE)/CAST(n3 AS DOUBLE)/100.0 AS mean3,
        |    sqrt(CAST(n3*ss3 - s3*s3 AS DOUBLE)/CAST(n3 AS DOUBLE)
        |      /CAST(n3 AS DOUBLE))/100.0 AS std3
        |  FROM st)
        |SELECT q.l_orderkey, q.l_linenumber,
        |  CASE WHEN std1 > 0 THEN round((q.l_quantity - mean1)/std1, 6) + 0 END
        |    AS l_quantity_z,
        |  CASE WHEN mx1 - mn1 > 0
        |    THEN round((q.l_quantity - mn1)/(mx1 - mn1), 6) + 0 END
        |    AS l_quantity_mm,
        |  CASE WHEN std2 > 0
        |    THEN round((q.l_extendedprice - mean2)/std2, 6) + 0 END
        |    AS l_extendedprice_z,
        |  CASE WHEN mx2 - mn2 > 0
        |    THEN round((q.l_extendedprice - mn2)/(mx2 - mn2), 6) + 0 END
        |    AS l_extendedprice_mm,
        |  CASE WHEN std3 > 0 THEN round((q.l_discount - mean3)/std3, 6) + 0 END
        |    AS l_discount_z,
        |  CASE WHEN mx3 - mn3 > 0
        |    THEN round((q.l_discount - mn3)/(mx3 - mn3), 6) + 0 END
        |    AS l_discount_mm
        |FROM q CROSS JOIN st2 ORDER BY l_orderkey, l_linenumber,
        |  l_extendedprice_z, l_quantity_z, l_discount_z,
        |  l_extendedprice_mm, l_quantity_mm, l_discount_mm""".stripMargin,

    "q162_corpus_manifest" ->
      """WITH d AS (SELECT doc_id, text,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h FROM documents),
        |w AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |      % 8 AS shard,
        |    length(text) AS nb,
        |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) AS w0,
        |    CAST(('0x' || substr(h, 9, 8)) AS BIGINT) AS w1,
        |    CAST(('0x' || substr(h, 17, 8)) AS BIGINT) AS w2,
        |    CAST(('0x' || substr(h, 25, 8)) AS BIGINT) AS w3
        |  FROM d),
        |g AS (SELECT shard, count(*) AS n_docs,
        |    CAST(sum(nb) AS BIGINT) AS n_bytes,
        |    CAST(sum(w0) % 4294967296 AS BIGINT) AS m0,
        |    CAST(sum(w1) % 4294967296 AS BIGINT) AS m1,
        |    CAST(sum(w2) % 4294967296 AS BIGINT) AS m2,
        |    CAST(sum(w3) % 4294967296 AS BIGINT) AS m3
        |  FROM w GROUP BY shard)
        |SELECT shard, n_docs, n_bytes,
        |  md5(CAST(m0 AS VARCHAR) || '-' || CAST(m1 AS VARCHAR) || '-' ||
        |      CAST(m2 AS VARCHAR) || '-' || CAST(m3 AS VARCHAR))
        |    AS manifest_hash
        |FROM g ORDER BY shard""".stripMargin,

    "q163_negative_sampling" ->
      """WITH pos AS (SELECT DISTINCT o.o_custkey AS user_id,
        |    l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |u AS (SELECT DISTINCT user_id FROM pos),
        |n AS (SELECT count(*) AS ni FROM part),
        |c AS (SELECT user_id, j,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '-' ||
        |      CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % ni AS item
        |  FROM u CROSS JOIN n CROSS JOIN generate_series(0, 7) AS t(j)),
        |cj AS (SELECT c.user_id, c.item, c.j FROM c
        |  JOIN part p ON c.item = p.p_partkey),
        |flt AS (SELECT cj.user_id, cj.item, cj.j FROM cj
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.user_id = cj.user_id AND pos.item = cj.item))
        |SELECT user_id, item AS neg_item, CAST(min(j) AS INT) AS sample_idx
        |FROM flt GROUP BY user_id, item
        |ORDER BY user_id, neg_item""".stripMargin,

    "q164_time_split" ->
      """WITH e AS (SELECT user_id AS u, ts FROM events WHERE ts IS NOT NULL),
        |o AS (SELECT u, ts, row_number() OVER (ORDER BY ts) AS rn,
        |    count(*) OVER () AS n FROM e),
        |c AS (SELECT max(ts) AS cut FROM o WHERE rn = ceil(n * 0.75)),
        |a AS (SELECT u, ts,
        |    CASE WHEN ts <= c.cut THEN 'train' ELSE 'test' END AS split
        |  FROM e CROSS JOIN c),
        |p AS (SELECT split, count(*) AS n_events,
        |    count(DISTINCT u) AS n_entities,
        |    min(ts) AS first_ts, max(ts) AS last_ts FROM a GROUP BY split),
        |tr AS (SELECT DISTINCT u FROM a WHERE split = 'train'),
        |cold AS (SELECT count(*) AS nc
        |  FROM (SELECT DISTINCT u FROM a WHERE split = 'test') t
        |  WHERE NOT EXISTS (SELECT 1 FROM tr WHERE tr.u = t.u))
        |SELECT split, n_events, n_entities, first_ts, last_ts,
        |  CASE WHEN split = 'test' THEN (SELECT nc FROM cold)
        |       ELSE 0 END AS n_cold_entities
        |FROM p ORDER BY split""".stripMargin,

    // Generated, not hand-written: the Rademacher sign lists come from
    // the same deterministic projectionSigns the Spark side uses, so the
    // two engines run the identical literal matrix.
    "q165_jl_projection" -> {
      val signs = graft.operators.Quantization.projectionSigns(64, 16)
      val projExprs = signs.map(s =>
        s"list_dot_product(cv, [${s.mkString(", ")}]) / 4.0")
        .mkString(",\n      ")
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id < 40),
         |p AS (SELECT vec_id, cv, [$projExprs] AS pv FROM c),
         |n AS (SELECT vec_id, cv, pv,
         |    sqrt(list_dot_product(cv, cv)) AS nv,
         |    sqrt(list_dot_product(pv, pv)) AS np FROM p)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.cv, b.cv) / (a.nv * b.nv), 6) AS cos_orig,
         |  round(list_dot_product(a.pv, b.pv) / (a.np * b.np), 6) AS cos_proj,
         |  round(abs(list_dot_product(a.cv, b.cv) / (a.nv * b.nv)
         |          - list_dot_product(a.pv, b.pv) / (a.np * b.np)), 6)
         |    AS abs_err
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q166_source_quota" ->
      """SELECT doc_id AS id, source AS "group", CAST(rn AS INT) AS rank
        |FROM (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 15 ORDER BY "group", rank""".stripMargin,

    "q167_quantile_norm" ->
      """WITH v AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS tokens
        |  FROM documents),
        |g AS (SELECT doc_id, source, tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY tokens, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS ng FROM v),
        |o AS (SELECT tokens AS norm_val,
        |    row_number() OVER (ORDER BY tokens, doc_id) AS grn FROM v),
        |t AS (SELECT count(*) AS n FROM v)
        |SELECT g.doc_id, g.source, g.tokens, o.norm_val
        |FROM g CROSS JOIN t
        |JOIN o ON o.grn =
        |  CAST(ceil(((2 * g.rn - 1) / (2.0 * g.ng)) * t.n) AS BIGINT)
        |ORDER BY g.doc_id""".stripMargin,

    "q168_lsh_planner" ->
      """WITH cfg AS (SELECT CAST(i AS INT) AS r, CAST(128 // i AS INT) AS b
        |  FROM generate_series(1, 128) t(i) WHERE 128 % i = 0),
        |grid AS (SELECT k * 0.05 AS s FROM generate_series(1, 19) g(k))
        |SELECT r, b, round(power(1.0/b, 1.0/r), 6) AS threshold,
        |  round(s, 2) AS s,
        |  round(1 - power(1 - power(s, r), b), 6) AS p_collide
        |FROM cfg CROSS JOIN grid ORDER BY r, s""".stripMargin,

    "q169_auc_eval" ->
      """WITH s AS (SELECT round(CAST(embedding AS DOUBLE[])[1], 2) + 0 AS sc,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings),
        |g AS (SELECT sc, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
        |  FROM s GROUP BY sc),
        |o AS (SELECT cp, c,
        |    sum(c) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - c + 1 AS mn,
        |    sum(c) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS mx
        |  FROM g),
        |t AS (SELECT CAST(sum(cp * (mn + mx)) AS BIGINT) AS sp,
        |    CAST(sum(cp) AS BIGINT) AS np,
        |    CAST(sum(c - cp) AS BIGINT) AS nn,
        |    count(*) AS n_thresholds FROM o)
        |SELECT np + nn AS n, np AS n_pos, nn AS n_neg, n_thresholds,
        |  CASE WHEN np > 0 AND nn > 0 THEN
        |    round(CAST(sp - np * (np + 1) AS DOUBLE)
        |      / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6)
        |  END AS auc
        |FROM t""".stripMargin,

    "q170_pr_curve" ->
      """WITH s AS (SELECT round(CAST(embedding AS DOUBLE[])[1], 2) + 0
        |      AS threshold,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings),
        |g AS (SELECT threshold, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
        |  FROM s GROUP BY threshold),
        |o AS (SELECT threshold,
        |    CAST(sum(cp) OVER w AS BIGINT) AS tp,
        |    CAST(sum(c - cp) OVER w AS BIGINT) AS fp
        |  FROM g WINDOW w AS (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS tp_all FROM g)
        |SELECT threshold, tp, fp, t.tp_all - tp AS fn,
        |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
        |  CASE WHEN t.tp_all > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(t.tp_all AS DOUBLE), 6)
        |  END AS recall
        |FROM o CROSS JOIN t ORDER BY threshold""".stripMargin,

    "q171_calibration" ->
      """WITH s AS (SELECT
        |    round((CAST(embedding AS DOUBLE[])[1] + 1.0) / 2.0, 2) + 0 AS p,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings),
        |g AS (SELECT LEAST(GREATEST(CAST(floor(p * 10) AS INT), 0), 9)
        |      AS bin,
        |    count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        |    SUM(CAST(p AS DECIMAL(18,2))) AS sp FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
        |SELECT bin, n, n_pos,
        |  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_conf,
        |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
        |  round(abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS abs_gap,
        |  round(abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
        |    * CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS ece_term
        |FROM g CROSS JOIN t ORDER BY bin""".stripMargin,

    // Generated: the DCG discount / ideal-DCG tables are the SAME
    // micro-long literals Evaluation.dcgWeightsMicro feeds the Spark
    // side — no cross-engine log() runs anywhere.
    "q172_retrieval_ndcg" -> {
      val w = graft.operators.Evaluation.dcgWeightsMicro(10)
      val idcg = w.scanLeft(0L)(_ + _).tail
      val wVals = w.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
      val iVals = idcg.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
      s"""WITH q AS (SELECT vec_id AS query_id,
         |    CAST(embedding AS DOUBLE[]) AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < 30),
         |c AS (SELECT vec_id AS neighbor_id,
         |    CAST(embedding AS DOUBLE[]) AS cv, label AS nl FROM embeddings),
         |scored AS (SELECT query_id, neighbor_id, ql, nl,
         |    ROUND(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv))
         |      * sqrt(list_dot_product(cv, cv))), 6) AS cosine
         |  FROM c, q WHERE query_id <> neighbor_id),
         |ranked AS (SELECT query_id, ql, nl, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored),
         |top AS (SELECT query_id, ql,
         |    CASE WHEN ql = nl THEN 1 ELSE 0 END AS rel, rnk
         |  FROM ranked WHERE rnk <= 10),
         |lc AS (SELECT label, count(*) - 1 AS n_rel FROM embeddings
         |  GROUP BY label),
         |wt AS (SELECT * FROM (VALUES $wVals) AS t(rnk, wm)),
         |agg AS (SELECT t.query_id, lc.n_rel,
         |    CAST(sum(t.rel) AS BIGINT) AS hits,
         |    CAST(sum(CASE WHEN t.rel = 1 THEN wt.wm ELSE 0 END) AS BIGINT)
         |      AS dcg,
         |    min(CASE WHEN t.rel = 1 THEN t.rnk END) AS fr
         |  FROM top t JOIN lc ON t.ql = lc.label JOIN wt ON wt.rnk = t.rnk
         |  GROUP BY 1, 2),
         |id AS (SELECT * FROM (VALUES $iVals) AS t(m, im))
         |SELECT a.query_id, a.n_rel, a.hits,
         |  CASE WHEN LEAST(a.n_rel, 10) > 0
         |    THEN round(CAST(a.dcg AS DOUBLE) / CAST(id.im AS DOUBLE), 6)
         |    ELSE 0.0 END AS ndcg,
         |  CASE WHEN a.fr IS NOT NULL
         |    THEN round(1.0 / CAST(a.fr AS DOUBLE), 6) ELSE 0.0 END AS mrr
         |FROM agg a JOIN id ON id.m = LEAST(a.n_rel, 10)
         |ORDER BY query_id""".stripMargin
    },

    "q173_preference_pairs" ->
      """WITH v AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS sc
        |  FROM documents),
        |ch AS (SELECT source, doc_id AS chosen_id, sc AS chosen_score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sc DESC, doc_id ASC) AS rn FROM v),
        |rj AS (SELECT source, doc_id AS rejected_id, sc AS rejected_score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sc ASC, doc_id ASC) AS rn FROM v),
        |n AS (SELECT source, count(*) AS n FROM v GROUP BY source)
        |SELECT ch.source, chosen_id, chosen_score, rejected_id,
        |  rejected_score,
        |  round(chosen_score - rejected_score, 6) AS margin
        |FROM ch JOIN rj ON ch.source = rj.source AND ch.rn = 1 AND rj.rn = 1
        |JOIN n ON n.source = ch.source
        |WHERE n.n >= 2 AND chosen_id <> rejected_id
        |ORDER BY ch.source""".stripMargin,

    // Generated: the manifest CTE chain is built once by a local helper
    // and instantiated for both corpus versions.
    "q174_manifest_diff" -> {
      def manifestSql(src: String, tag: String) =
        s"""w$tag AS (SELECT
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
           |      AS BIGINT) % 8 AS shard,
           |    length(text) AS nb,
           |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) AS w0,
           |    CAST(('0x' || substr(h, 9, 8)) AS BIGINT) AS w1,
           |    CAST(('0x' || substr(h, 17, 8)) AS BIGINT) AS w2,
           |    CAST(('0x' || substr(h, 25, 8)) AS BIGINT) AS w3
           |  FROM (SELECT doc_id, text,
           |      md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
           |    FROM $src)),
           |g$tag AS (SELECT shard, count(*) AS n_docs,
           |    CAST(sum(nb) AS BIGINT) AS n_bytes,
           |    md5(CAST(CAST(sum(w0) % 4294967296 AS BIGINT) AS VARCHAR) ||
           |      '-' || CAST(CAST(sum(w1) % 4294967296 AS BIGINT) AS VARCHAR) ||
           |      '-' || CAST(CAST(sum(w2) % 4294967296 AS BIGINT) AS VARCHAR) ||
           |      '-' || CAST(CAST(sum(w3) % 4294967296 AS BIGINT) AS VARCHAR))
           |      AS mh
           |  FROM w$tag GROUP BY shard)""".stripMargin
      s"""WITH dref AS (SELECT doc_id, text FROM documents),
         |dcur AS (SELECT doc_id,
         |    CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END
         |      AS text
         |  FROM documents WHERE doc_id % 97 <> 0),
         |${manifestSql("dref", "r")},
         |${manifestSql("dcur", "c")}
         |SELECT COALESCE(gr.shard, gc.shard) AS shard,
         |  CASE WHEN gr.shard IS NULL THEN 'added'
         |       WHEN gc.shard IS NULL THEN 'removed'
         |       WHEN gr.mh = gc.mh THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  COALESCE(gc.n_docs, 0) - COALESCE(gr.n_docs, 0) AS doc_delta,
         |  COALESCE(gc.n_bytes, 0) - COALESCE(gr.n_bytes, 0) AS byte_delta
         |FROM gr FULL OUTER JOIN gc ON gr.shard = gc.shard
         |ORDER BY shard""".stripMargin
    },

    "q175_group_auc" ->
      """WITH s AS (SELECT source,
        |    round(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 2)
        |      AS sc,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |g AS (SELECT source, sc, count(*) AS c,
        |    CAST(sum(y) AS BIGINT) AS cp FROM s GROUP BY 1, 2),
        |o AS (SELECT source, cp, c,
        |    sum(c) OVER w - c + 1 AS mn, sum(c) OVER w AS mx
        |  FROM g WINDOW w AS (PARTITION BY source ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT source, CAST(sum(cp * (mn + mx)) AS BIGINT) AS sp,
        |    CAST(sum(cp) AS BIGINT) AS np, CAST(sum(c - cp) AS BIGINT) AS nn,
        |    count(*) AS n_thresholds FROM o GROUP BY source)
        |SELECT source, np + nn AS n, np AS n_pos, nn AS n_neg, n_thresholds,
        |  CASE WHEN np > 0 AND nn > 0 THEN
        |    round(CAST(sp - np * (np + 1) AS DOUBLE)
        |      / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6)
        |  END AS auc
        |FROM t ORDER BY source""".stripMargin,

    // Generated: 64 per-dimension exact sums, mirroring
    // Similarity.centroidOutliers' decimal quantization.
    "q176_embedding_outliers" -> {
      val sums = (0 until 64).map(i =>
        s"SUM(CAST(CAST(cv[${i + 1}] AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS s$i")
        .mkString(", ")
      val means = (0 until 64).map(i =>
        s"CAST(s$i AS DOUBLE)/1000000.0/CAST(n AS DOUBLE)").mkString(", ")
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings),
         |st AS (SELECT count(*) AS n, $sums FROM c),
         |m AS (SELECT n, [$means] AS mv FROM st),
         |d AS (SELECT vec_id,
         |    [cv[i] - mv[i] FOR i IN generate_series(1, 64)] AS dv
         |  FROM c CROSS JOIN m)
         |SELECT vec_id, round(sqrt(list_dot_product(dv, dv)), 6) AS dist
         |FROM d ORDER BY dist DESC, vec_id LIMIT 20""".stripMargin
    },

    // Doubled midranks (2*cum - c + 1, integers) mirror
    // Evaluation.spearman's exact DECIMAL(38,0) moment fold; HUGEINT is
    // DuckDB's 128-bit equivalent.
    "q177_spearman" ->
      """WITH v AS (SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
        |    CAST(n_chars AS DOUBLE) AS y
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
        |gx AS (SELECT x, count(*) AS c FROM v GROUP BY x),
        |rx AS (SELECT x,
        |    2 * sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - c + 1 AS a
        |  FROM gx),
        |gy AS (SELECT y, count(*) AS c FROM v GROUP BY y),
        |ry AS (SELECT y,
        |    2 * sum(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - c + 1 AS b
        |  FROM gy),
        |r AS (SELECT CAST(a AS HUGEINT) AS a, CAST(b AS HUGEINT) AS b
        |  FROM v JOIN rx USING (x) JOIN ry USING (y)),
        |t AS (SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb,
        |    sum(a*a) AS saa, sum(b*b) AS sbb, sum(a*b) AS sab FROM r)
        |SELECT n,
        |  CASE WHEN CAST(n AS HUGEINT)*saa - sa*sa > 0
        |        AND CAST(n AS HUGEINT)*sbb - sb*sb > 0 THEN
        |    round(CAST(CAST(n AS HUGEINT)*sab - sa*sb AS DOUBLE)
        |      / sqrt(CAST(CAST(n AS HUGEINT)*saa - sa*sa AS DOUBLE)
        |           * CAST(CAST(n AS HUGEINT)*sbb - sb*sb AS DOUBLE)), 6)
        |  END AS rho
        |FROM t""".stripMargin,

    // Expected counts and chi2 terms reproduce Profiling.contingencyChi2's
    // single IEEE sequence: e = rt*ct/n, term = (o-e)*(o-e)/e.
    "q178_chi2_bias" ->
      """WITH o AS (SELECT lang, source, count(*) AS n_obs
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
        |ct AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS n FROM documents)
        |SELECT rt.lang, ct.source, COALESCE(o.n_obs, 0) AS n_obs,
        |  round(CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |    / CAST(t.n AS DOUBLE), 6) AS expected,
        |  round((CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
        |      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    * (CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
        |      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE)),
        |    6) AS chi2_term
        |FROM rt CROSS JOIN ct
        |LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source
        |CROSS JOIN t
        |ORDER BY 1, 2""".stripMargin,

    "q179_roc_curve" ->
      """WITH s AS (SELECT round(CAST(embedding AS DOUBLE[])[1], 2) + 0
        |      AS threshold,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y FROM embeddings),
        |g AS (SELECT threshold, count(*) AS c, CAST(sum(y) AS BIGINT) AS cp
        |  FROM s GROUP BY threshold),
        |o AS (SELECT threshold,
        |    CAST(sum(cp) OVER w AS BIGINT) AS tp,
        |    CAST(sum(c - cp) OVER w AS BIGINT) AS fp
        |  FROM g WINDOW w AS (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS p,
        |    CAST(sum(c - cp) AS BIGINT) AS nn FROM g)
        |SELECT threshold, tp, fp,
        |  CASE WHEN t.p > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(t.p AS DOUBLE), 6) END AS tpr,
        |  CASE WHEN t.nn > 0 THEN
        |    round(CAST(fp AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) END AS fpr
        |FROM o CROSS JOIN t ORDER BY threshold""".stripMargin,

    // po/pe/kappa reproduce Evaluation.cohenKappa's IEEE sequence; the
    // expected-agreement products widen to HUGEINT like the Spark side's
    // DECIMAL(38,0).
    "q180_rater_kappa" ->
      """WITH v AS (SELECT
        |    CASE WHEN len(string_split(text, ' ')) >= 60 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b FROM documents),
        |ag AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM v),
        |ma AS (SELECT a AS k, count(*) AS ca FROM v GROUP BY a),
        |mb AS (SELECT b AS k, count(*) AS cb FROM v GROUP BY b),
        |pe AS (SELECT COALESCE(sum(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)),
        |    0) AS pe_num FROM ma JOIN mb USING (k))
        |SELECT n,
        |  round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
        |  round(CAST(pe_num AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
        |  CASE WHEN CAST(pe_num AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0 THEN
        |    round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      / (1.0 - CAST(pe_num AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
        |  END AS kappa
        |FROM ag CROSS JOIN pe ORDER BY n""".stripMargin,

    // Assignment CTE is the q100 convention (first-10 centroids, argmax
    // cosine, ties to the smallest cell).
    "q181_cluster_purity" ->
      """WITH c AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 10),
        |v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |scored AS (SELECT vec_id, label, cell,
        |  round(list_dot_product(vv, cv)
        |    / (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(cv, cv))), 6)
        |    AS cos
        |  FROM v CROSS JOIN c),
        |assigned AS (SELECT cell, label FROM (
        |  SELECT vec_id, label, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |  FROM scored) WHERE rn = 1),
        |cl AS (SELECT cell, label, count(*) AS nck FROM assigned GROUP BY 1, 2),
        |pc AS (SELECT cell, CAST(sum(nck) AS BIGINT) AS n_vecs
        |  FROM cl GROUP BY cell),
        |top AS (SELECT cell, label AS top_label, nck AS n_top FROM (
        |  SELECT cell, label, nck,
        |    row_number() OVER (PARTITION BY cell ORDER BY nck DESC, label) AS r
        |  FROM cl) WHERE r = 1)
        |SELECT pc.cell, pc.n_vecs, top.top_label, top.n_top,
        |  round(CAST(top.n_top AS DOUBLE) / CAST(pc.n_vecs AS DOUBLE), 6)
        |    AS purity
        |FROM pc JOIN top ON pc.cell = top.cell ORDER BY pc.cell""".stripMargin,

    // Entropy/MI terms are the same fixed IEEE sequences as
    // Similarity.clusterAgreementSummary (natural log over exact counts).
    "q182_cluster_nmi" ->
      """WITH c AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 10),
        |v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv
        |  FROM embeddings),
        |scored AS (SELECT vec_id, label, cell,
        |  round(list_dot_product(vv, cv)
        |    / (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(cv, cv))), 6)
        |    AS cos
        |  FROM v CROSS JOIN c),
        |assigned AS (SELECT cell, label FROM (
        |  SELECT vec_id, label, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |  FROM scored) WHERE rn = 1),
        |cl AS (SELECT cell, label, count(*) AS nck FROM assigned GROUP BY 1, 2),
        |nc AS (SELECT cell, CAST(sum(nck) AS BIGINT) AS ncnt, max(nck) AS mx
        |  FROM cl GROUP BY cell),
        |nl AS (SELECT label, CAST(sum(nck) AS BIGINT) AS nlc
        |  FROM cl GROUP BY label),
        |t AS (SELECT CAST(sum(nck) AS BIGINT) AS n FROM cl),
        |hc AS (SELECT count(*) AS n_cells,
        |    sum(-(CAST(ncnt AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * ln(CAST(ncnt AS DOUBLE) / CAST(t.n AS DOUBLE))) AS hcv
        |  FROM nc CROSS JOIN t),
        |hl AS (SELECT count(*) AS n_labels,
        |    sum(-(CAST(nlc AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * ln(CAST(nlc AS DOUBLE) / CAST(t.n AS DOUBLE))) AS hlv
        |  FROM nl CROSS JOIN t),
        |pur AS (SELECT CAST(sum(mx) AS BIGINT) AS mxsum FROM nc),
        |mi AS (SELECT sum((CAST(nck AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    * ln(CAST(nck AS DOUBLE) * CAST(t.n AS DOUBLE)
        |      / (CAST(ncnt AS DOUBLE) * CAST(nlc AS DOUBLE)))) AS miv
        |  FROM cl JOIN nc USING (cell) JOIN nl USING (label) CROSS JOIN t)
        |SELECT t.n AS n, hc.n_cells, hl.n_labels,
        |  round(CAST(pur.mxsum AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS purity,
        |  CASE WHEN hc.hcv > 0 AND hl.hlv > 0 THEN
        |    round(mi.miv / sqrt(hc.hcv * hl.hlv), 6) END AS nmi
        |FROM t CROSS JOIN hc CROSS JOIN hl CROSS JOIN pur CROSS JOIN mi"""
        .stripMargin,

    // Integer ECDF-gap argmax mirrors Evaluation.ksTwoSample: HUGEINT
    // cross-multiplied cumulative counts, ties to the smallest value.
    "q183_ks_test" ->
      """WITH av AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |bv AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |ga AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
        |gb AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
        |m AS (SELECT COALESCE(ga.v, gb.v) AS v, COALESCE(ca, 0) AS ca,
        |    COALESCE(cb, 0) AS cb FROM ga FULL OUTER JOIN gb ON ga.v = gb.v),
        |c AS (SELECT v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb
        |  FROM m WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb, count(*) AS nv FROM m),
        |g AS (SELECT v, na, nb, nv,
        |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
        |      AS gap
        |  FROM c CROSS JOIN t),
        |mx AS (SELECT max(gap) AS gmax FROM g)
        |SELECT na AS n_a, nb AS n_b, nv AS n_values,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round(CAST(gmax AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) END AS d_stat,
        |  min(v) AS at_value
        |FROM g CROSS JOIN mx WHERE gap = gmax
        |GROUP BY na, nb, nv, gmax""".stripMargin,

    // Concordant/discordant HUGEINT pair sums over the joint cell grid,
    // tie terms doubled — Evaluation.kendallTau's DECIMAL(38,0) walk.
    "q184_kendall_tau" ->
      """WITH v AS (SELECT CAST(floor(n_chars / 100) AS DOUBLE) AS x,
        |    CAST(floor(len(string_split(text, ' ')) / 20) AS DOUBLE) AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |cells AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c
        |  FROM v GROUP BY x, y),
        |pairs AS (SELECT
        |    COALESCE(sum(CASE WHEN a.y < b.y THEN a.c * b.c END),
        |      CAST(0 AS HUGEINT)) AS concordant,
        |    COALESCE(sum(CASE WHEN a.y > b.y THEN a.c * b.c END),
        |      CAST(0 AS HUGEINT)) AS discordant
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |t AS (SELECT CAST(sum(c) AS HUGEINT) AS n, count(*) AS n_cells
        |  FROM cells),
        |tx AS (SELECT COALESCE(sum(cx * (cx - 1)), CAST(0 AS HUGEINT))
        |    AS tx2 FROM (SELECT sum(c) AS cx FROM cells GROUP BY x)),
        |ty AS (SELECT COALESCE(sum(cy * (cy - 1)), CAST(0 AS HUGEINT))
        |    AS ty2 FROM (SELECT sum(c) AS cy FROM cells GROUP BY y))
        |SELECT CAST(t.n AS BIGINT) AS n, t.n_cells,
        |  CAST(concordant AS BIGINT) AS concordant,
        |  CAST(discordant AS BIGINT) AS discordant,
        |  CASE WHEN (CAST(t.n * (t.n - 1) AS DOUBLE)
        |        - CAST(tx2 AS DOUBLE)) / 2.0 > 0
        |      AND (CAST(t.n * (t.n - 1) AS DOUBLE)
        |        - CAST(ty2 AS DOUBLE)) / 2.0 > 0 THEN
        |    round(CAST(concordant - discordant AS DOUBLE)
        |      / sqrt(((CAST(t.n * (t.n - 1) AS DOUBLE)
        |          - CAST(tx2 AS DOUBLE)) / 2.0)
        |        * ((CAST(t.n * (t.n - 1) AS DOUBLE)
        |          - CAST(ty2 AS DOUBLE)) / 2.0)), 6)
        |  END AS tau_b
        |FROM t CROSS JOIN pairs CROSS JOIN tx CROSS JOIN ty
        |ORDER BY 1""".stripMargin,

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

    // P-bar/P-e from exact integer agreement weights r(r-1)+(k-r)(k-r-1)
    // — Evaluation.fleissKappa's one-fold arithmetic, k = 3 raters.
    "q186_fleiss_kappa" ->
      """WITH v AS (SELECT
        |    (CASE WHEN len(string_split(text, ' ')) >= 60 THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
        |     + CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END) AS r
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
        |a AS (SELECT count(*) AS n, CAST(sum(r) AS HUGEINT) AS sr,
        |    CAST(sum(r * (r - 1) + (3 - r) * (3 - r - 1)) AS HUGEINT)
        |      AS sagree
        |  FROM v),
        |k AS (SELECT n, sr, sagree,
        |    CAST(sagree AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0 * 2.0)
        |      AS pbar,
        |    (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
        |      * (CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
        |    + (1.0 - CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
        |      * (1.0 - CAST(sr AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
        |      AS pe
        |  FROM a)
        |SELECT n, 3 AS n_raters, round(pbar, 6) AS p_bar,
        |  round(pe, 6) AS p_e,
        |  CASE WHEN pe < 1.0 THEN round((pbar - pe) / (1.0 - pe), 6)
        |  END AS kappa
        |FROM k
        |ORDER BY 1""".stripMargin,

    // Generated: 8 quantized dim sums + 36 HUGEINT cross-product sums,
    // numerator n*Sij - Si*Sj exact — Similarity.embeddingCovariance.
    "q187_embedding_cov" -> {
      val dims = 8
      val q = (1 to dims).map(i =>
        s"CAST(CAST(cv[$i] AS DECIMAL(18,6)) * 1000000 AS HUGEINT)")
      val pairIdx = for { i <- 0 until dims; j <- i until dims } yield (i, j)
      val sums = (0 until dims).map(i => s"SUM(${q(i)}) AS s$i") ++
        pairIdx.map { case (i, j) =>
          s"SUM(${q(i)} * ${q(j)}) AS p${i}_$j" }
      val branches = pairIdx.map { case (i, j) =>
        s"""SELECT $i AS i, $j AS j, n,
           |  round(CAST(CAST(n AS HUGEINT) * p${i}_$j - s$i * s$j AS DOUBLE)
           |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 9) AS cov
           |FROM st""".stripMargin
      }
      s"""WITH c AS (SELECT CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |st AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM c)
         |${branches.mkString("\nUNION ALL\n")}
         |ORDER BY i, j""".stripMargin
    },

    // Per-user pairwise-slope median with the explicit floor-midrank
    // picks — TimeSeries.theilSen's sum/count convention.
    "q188_theil_sen" ->
      """WITH p AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS DOUBLE) AS x,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))),
        |np AS (SELECT user_id, count(*) AS n_points FROM p GROUP BY user_id),
        |s AS (SELECT a.user_id, (b.y - a.y) / (b.x - a.x) AS sl
        |  FROM p a JOIN p b ON a.user_id = b.user_id AND a.x < b.x),
        |r AS (SELECT user_id, sl,
        |    row_number() OVER (PARTITION BY user_id ORDER BY sl) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS npair FROM s),
        |m AS (SELECT user_id, npair AS n_pairs,
        |    round(sum(sl) / count(*), 6) AS slope
        |  FROM r
        |  WHERE rn = CAST(floor((npair + 1) / 2.0) AS BIGINT)
        |     OR rn = CAST(floor((npair + 2) / 2.0) AS BIGINT)
        |  GROUP BY user_id, npair)
        |SELECT m.user_id, np.n_points, m.n_pairs, m.slope
        |FROM m JOIN np USING (user_id) ORDER BY m.user_id""".stripMargin,

    // Full power iteration reproduced in SQL: the 4x4 covariance (q187's
    // exact HUGEINT arithmetic at dims=4) feeds a 30-step recursive CTE
    // whose per-step arithmetic is the IDENTICAL left-associative IEEE
    // sequence the driver-side loop runs (fold from 0.5 start, sqrt
    // norm, first-max sign convention), then the same strict-index-order
    // dot per row.
    "q189_pca_project" -> {
      val dims = 4
      val q = (1 to dims).map(i =>
        s"CAST(CAST(cv[$i] AS DECIMAL(18,6)) * 1000000 AS HUGEINT)")
      val pairIdx = for { i <- 0 until dims; j <- i until dims } yield (i, j)
      val sums = (0 until dims).map(i => s"SUM(${q(i)}) AS s$i") ++
        pairIdx.map { case (i, j) => s"SUM(${q(i)} * ${q(j)}) AS p${i}_$j" }
      def covExpr(i: Int, j: Int): String = {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        s"round(CAST(CAST(n AS HUGEINT) * p${a}_$b - s$a * s$b AS DOUBLE)" +
          s" / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 9)"
      }
      val mCols = (for { i <- 0 until dims; j <- 0 until dims }
        yield s"${covExpr(i, j)} AS m${i}_$j").mkString(", ")
      val mv = (0 until dims).map(i =>
        (0 until dims).map(j => s"m${i}_$j * v$j").mkString(" + "))
      val nrmSq = (0 until dims).map(i => s"n$i * n$i").mkString(" + ")
      val absGe = (0 until dims).map { i =>
        val later = (i + 1 until dims).map(j => s"abs(v$i) >= abs(v$j)")
        if (later.isEmpty) s"ELSE v$i END"
        else s"WHEN ${later.mkString(" AND ")} THEN v$i"
      }
      val dotExpr = (0 until dims).map(i => s"cv[${i + 1}] * c$i")
        .mkString(" + ")
      s"""WITH RECURSIVE
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings),
         |st AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM c),
         |m AS (SELECT $mCols FROM st),
         |it AS (
         |  SELECT 0 AS k, ${(0 until dims)
              .map(i => s"CAST(0.5 AS DOUBLE) AS v$i").mkString(", ")}
         |  UNION ALL
         |  SELECT k + 1, ${(0 until dims)
              .map(i => s"n$i / nrm AS v$i").mkString(", ")}
         |  FROM (SELECT k, ${(0 until dims)
              .map(i => s"n$i").mkString(", ")}, sqrt($nrmSq) AS nrm
         |    FROM (SELECT k, ${mv.zipWithIndex
              .map { case (e, i) => s"$e AS n$i" }.mkString(", ")}
         |      FROM it, m))
         |  WHERE k < 30),
         |fin AS (SELECT ${(0 until dims).map(i => s"v$i").mkString(", ")},
         |  CASE ${absGe.mkString(" ")} AS pick
         |  FROM it WHERE k = 30),
         |comp AS (SELECT ${(0 until dims)
              .map(i => s"CASE WHEN pick < 0 THEN -v$i ELSE v$i END AS c$i")
              .mkString(", ")}
         |  FROM fin)
         |SELECT vec_id, round($dotExpr, 6) AS score
         |FROM c, comp ORDER BY vec_id""".stripMargin
    },

    // Each check reproduced as plain SQL aggregation; "check" quoted
    // (reserved word). passed compares UNROUNDED values, observed
    // rounds for display — the operator's gate-vs-display contract.
    "q190_data_checks" ->
      """WITH rw AS (SELECT count(*) AS n, count(o_custkey) AS nn,
        |    coalesce(sum(CASE WHEN o_totalprice IS NOT NULL AND
        |      (CAST(o_totalprice AS DOUBLE) < 0.0 OR
        |       CAST(o_totalprice AS DOUBLE) > 1000000.0)
        |      THEN 1 ELSE 0 END), 0) AS viol_range,
        |    coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL AND
        |      o_orderstatus NOT IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END), 0) AS viol_set
        |  FROM orders),
        |uq AS (SELECT coalesce(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0)
        |    AS viol
        |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
        |rf AS (SELECT count(*) AS viol FROM orders
        |  WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |fd AS (SELECT coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0)
        |    AS viol
        |  FROM (SELECT count(DISTINCT o_orderdate) AS d FROM orders
        |    GROUP BY o_orderkey))
        |SELECT * FROM (
        |SELECT 'c1_custkey_complete' AS "check", 'completeness' AS kind,
        |  CASE WHEN n > 0
        |    THEN round(CAST(nn AS DOUBLE) / CAST(n AS DOUBLE), 6) END
        |    AS observed,
        |  1.0 AS threshold,
        |  (n = 0 OR CAST(nn AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0) AS passed
        |FROM rw
        |UNION ALL
        |SELECT 'c2_orderkey_unique', 'uniqueness', CAST(viol AS DOUBLE),
        |  0.0, viol = 0 FROM uq
        |UNION ALL
        |SELECT 'c3_price_range', 'value_range', CAST(viol_range AS DOUBLE),
        |  0.0, viol_range = 0 FROM rw
        |UNION ALL
        |SELECT 'c4_status_domain', 'in_set', CAST(viol_set AS DOUBLE),
        |  0.0, viol_set = 0 FROM rw
        |UNION ALL
        |SELECT 'c5_rowcount', 'row_count', CAST(n AS DOUBLE),
        |  CAST(NULL AS DOUBLE), n >= 1 AND n <= 100000000 FROM rw
        |UNION ALL
        |SELECT 'c6_custkey_ref', 'referential', CAST(viol AS DOUBLE),
        |  0.0, viol = 0 FROM rf
        |UNION ALL
        |SELECT 'c7_key_determines_date', 'functional_dep',
        |  CAST(viol AS DOUBLE), 0.0, viol = 0 FROM fd
        |) ORDER BY "check"""".stripMargin,

    // Positive modulo spelled ((x % 10) + 10) % 10 to mirror Spark's
    // pmod; labels stringified like the operator.
    "q191_confusion" ->
      """WITH pr AS (SELECT CAST(label AS VARCHAR) AS actual,
        |    CAST(((CAST(floor(CAST(embedding AS DOUBLE[])[1] * 10)
        |      AS BIGINT) % 10) + 10) % 10 AS VARCHAR) AS predicted
        |  FROM embeddings),
        |pairs AS (SELECT actual, predicted, count(*) AS c FROM pr
        |  GROUP BY actual, predicted),
        |labels AS (SELECT DISTINCT actual AS l FROM pairs
        |  UNION SELECT DISTINCT predicted FROM pairs),
        |rt AS (SELECT actual, sum(c) AS rtot FROM pairs GROUP BY actual)
        |SELECT a.l AS actual, p.l AS predicted,
        |  coalesce(pairs.c, 0) AS n_obs,
        |  CASE WHEN rt.rtot > 0 THEN
        |    round(CAST(coalesce(pairs.c, 0) AS DOUBLE) /
        |      CAST(rt.rtot AS DOUBLE), 6) END AS row_rate
        |FROM labels a CROSS JOIN labels p
        |LEFT JOIN pairs ON pairs.actual = a.l AND pairs.predicted = p.l
        |LEFT JOIN rt ON rt.actual = a.l
        |ORDER BY actual, predicted""".stripMargin,

    "q192_class_report" ->
      """WITH pr AS (SELECT CAST(label AS VARCHAR) AS a,
        |    CAST(((CAST(floor(CAST(embedding AS DOUBLE[])[1] * 10)
        |      AS BIGINT) % 10) + 10) % 10 AS VARCHAR) AS p
        |  FROM embeddings),
        |act AS (SELECT a AS label, count(*) AS n_actual FROM pr GROUP BY a),
        |pre AS (SELECT p AS label, count(*) AS n_predicted FROM pr
        |  GROUP BY p),
        |diag AS (SELECT a AS label, count(*) AS tp FROM pr WHERE a = p
        |  GROUP BY a),
        |m AS (SELECT coalesce(act.label, pre.label) AS label,
        |    coalesce(n_actual, 0) AS n_actual,
        |    coalesce(n_predicted, 0) AS n_predicted
        |  FROM act FULL OUTER JOIN pre ON act.label = pre.label)
        |SELECT m.label, m.n_actual, m.n_predicted,
        |  coalesce(diag.tp, 0) AS tp,
        |  CASE WHEN m.n_predicted > 0 THEN
        |    round(CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_predicted, 6)
        |    END AS precision,
        |  CASE WHEN m.n_actual > 0 THEN
        |    round(CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_actual, 6)
        |    END AS recall,
        |  CASE WHEN m.n_predicted > 0 AND m.n_actual > 0 AND
        |      (CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_predicted +
        |       CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_actual) > 0 THEN
        |    round(2.0 * (CAST(coalesce(diag.tp, 0) AS DOUBLE) /
        |        m.n_predicted) *
        |      (CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_actual) /
        |      (CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_predicted +
        |       CAST(coalesce(diag.tp, 0) AS DOUBLE) / m.n_actual), 6)
        |    END AS f1
        |FROM m LEFT JOIN diag ON diag.label = m.label
        |ORDER BY m.label""".stripMargin,

    // Same clamp constant (1e-15) as the operator default.
    "q193_prob_scores" ->
      """WITH s AS (SELECT
        |    greatest(0.0, least(1.0,
        |      round(0.5 + CAST(embedding AS DOUBLE[])[1] / 4.0, 3))) AS p,
        |    CAST(label >= 5 AS DOUBLE) AS y
        |  FROM embeddings),
        |c AS (SELECT p, y,
        |    least(greatest(p, 1e-15), 1.0 - 1e-15) AS pc FROM s)
        |SELECT count(*) AS n,
        |  round(avg((p - y) * (p - y)), 6) AS brier,
        |  round(avg(-(y * ln(pc) + (1.0 - y) * ln(1.0 - pc))), 6)
        |    AS log_loss
        |FROM c
        |ORDER BY 1""".stripMargin,

    // Feature/value/label contingency per feature; probabilities are
    // exact count ratios, each MI term one IEEE sequence (q182's NMI
    // convention), rank by mi desc with name tiebreak.
    "q195_mi_ranking" ->
      """WITH s AS (
        |  SELECT 'len_decile' AS f,
        |    CAST(least(CAST(floor(n_chars / 100.0) AS BIGINT), 9)
        |      AS VARCHAR) AS v, lang AS y FROM documents
        |  UNION ALL
        |  SELECT 'token_bucket',
        |    CAST(least(CAST(floor(len(string_split(text, ' ')) / 20.0)
        |      AS BIGINT), 9) AS VARCHAR), lang FROM documents
        |  UNION ALL
        |  SELECT 'source', source, lang FROM documents),
        |st AS (SELECT f, v, y FROM s
        |  WHERE y IS NOT NULL AND v IS NOT NULL),
        |cells AS (SELECT f, v, y, count(*) AS c FROM st GROUP BY f, v, y),
        |vm AS (SELECT f, v, sum(c) AS cv FROM cells GROUP BY f, v),
        |ym AS (SELECT f, y, sum(c) AS cy FROM cells GROUP BY f, y),
        |tt AS (SELECT f, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY f),
        |mi AS (SELECT cells.f,
        |    sum((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE) /
        |        (CAST(cv AS DOUBLE) * CAST(cy AS DOUBLE)))) AS mi
        |  FROM cells
        |  JOIN vm ON vm.f = cells.f AND vm.v = cells.v
        |  JOIN ym ON ym.f = cells.f AND ym.y = cells.y
        |  JOIN tt ON tt.f = cells.f
        |  GROUP BY cells.f),
        |nv AS (SELECT f, count(*) AS n_values FROM vm GROUP BY f),
        |nl AS (SELECT f, count(*) AS n_labels FROM ym GROUP BY f)
        |SELECT tt.f AS feature, tt.n, nv.n_values, nl.n_labels,
        |  round(mi.mi, 6) AS mi,
        |  CAST(row_number() OVER (ORDER BY mi.mi DESC, tt.f) AS INT)
        |    AS rank
        |FROM tt JOIN mi ON mi.f = tt.f JOIN nv ON nv.f = tt.f
        |JOIN nl ON nl.f = tt.f
        |ORDER BY feature""".stripMargin,

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

    // Group x prediction x label cells → rates and gaps; group is
    // vec_id mod 4, prediction = first-dim sign, label binarized at 5.
    "q197_fairness_panel" ->
      """WITH s AS (SELECT CAST(vec_id % 4 AS VARCHAR) AS grp,
        |    CAST(CAST(embedding AS DOUBLE[])[1] >= 0 AS BIGINT) AS p,
        |    CAST(label >= 5 AS BIGINT) AS y
        |  FROM embeddings),
        |g AS (SELECT grp, count(*) AS n,
        |    CAST(sum(p) AS BIGINT) AS np, CAST(sum(y) AS BIGINT) AS ny,
        |    CAST(sum(p * y) AS BIGINT) AS tp,
        |    CAST(sum(p * (1 - y)) AS BIGINT) AS fp
        |  FROM s GROUP BY grp),
        |a AS (SELECT
        |    CAST(sum(p) AS DOUBLE) / count(*) AS gpos,
        |    CAST(sum(p * y) AS DOUBLE) / CAST(sum(y) AS DOUBLE) AS gtpr,
        |    CAST(sum(p * (1 - y)) AS DOUBLE) /
        |      CAST(count(*) - sum(y) AS DOUBLE) AS gfpr
        |  FROM s)
        |SELECT grp AS "group", n,
        |  round(CAST(np AS DOUBLE) / n, 6) AS pos_rate,
        |  CASE WHEN ny > 0 THEN
        |    round(CAST(tp AS DOUBLE) / ny, 6) END AS tpr,
        |  CASE WHEN n - ny > 0 THEN
        |    round(CAST(fp AS DOUBLE) / (n - ny), 6) END AS fpr,
        |  round(CAST(np AS DOUBLE) / n - gpos, 6) AS pos_rate_gap,
        |  CASE WHEN ny > 0 THEN
        |    round(CAST(tp AS DOUBLE) / ny - gtpr, 6) END AS tpr_gap,
        |  CASE WHEN n - ny > 0 THEN
        |    round(CAST(fp AS DOUBLE) / (n - ny) - gfpr, 6) END AS fpr_gap
        |FROM g, a ORDER BY "group"""".stripMargin,

    // Bigram construction via the 1-based position spine
    // range(1, len(t)); add-1 smoothing spelled with the same literal
    // arithmetic as the operator.
    "q198_bigram_nll" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2,
        |    doc_id % 7 = 0 AS held
        |  FROM d, unnest(range(1, len(t))) AS u(i)),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bg WHERE NOT held
        |  GROUP BY w1, w2),
        |cu AS (SELECT w1, sum(cb) AS cu FROM cb GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(t) AS w FROM d WHERE doc_id % 7 <> 0)),
        |ht AS (SELECT source, w1, w2, count(*) AS n FROM bg WHERE held
        |  GROUP BY source, w1, w2),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM bg
        |  WHERE held GROUP BY source),
        |sc AS (SELECT ht.source, ht.n,
        |    -ln((CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0) /
        |      (CAST(coalesce(cu.cu, 0) AS DOUBLE) +
        |        1.0 * CAST(v.v AS DOUBLE))) AS nll
        |  FROM ht LEFT JOIN cb ON cb.w1 = ht.w1 AND cb.w2 = ht.w2
        |  LEFT JOIN cu ON cu.w1 = ht.w1
        |  CROSS JOIN v)
        |SELECT sc.source, nd.n_docs, CAST(sum(sc.n) AS BIGINT) AS n_bigrams,
        |  round(sum(sc.nll * CAST(sc.n AS DOUBLE)) /
        |    CAST(sum(sc.n) AS DOUBLE), 6) AS avg_nll
        |FROM sc JOIN nd ON nd.source = sc.source
        |GROUP BY sc.source, nd.n_docs
        |ORDER BY sc.source""".stripMargin,

    "q199_readability" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |    CAST(sum(greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
        |      AS BIGINT) AS n_sentences,
        |    CAST(sum(greatest(
        |      len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1))
        |      AS BIGINT) AS n_syllables
        |  FROM documents WHERE text IS NOT NULL GROUP BY source)
        |SELECT source, n_docs, n_words, n_sentences, n_syllables,
        |  round(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6)
        |    AS words_per_sentence,
        |  round(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        |    AS syllables_per_word,
        |  CASE WHEN n_words > 0 THEN round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) /
        |        CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) /
        |        CAST(n_words AS DOUBLE)), 6) END AS flesch
        |FROM a ORDER BY source""".stripMargin,

    // (1.0 - 0.9) spelled as the subtraction so both engines carry the
    // identical IEEE value, not a 0.1 literal.
    "q200_rbo" ->
      """WITH s AS (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[])[1] AS s1,
        |    CAST(embedding AS DOUBLE[])[2] AS s2
        |  FROM embeddings),
        |ra AS (SELECT vec_id,
        |    row_number() OVER (ORDER BY s1 DESC, vec_id) AS r
        |  FROM s ORDER BY s1 DESC, vec_id LIMIT 20),
        |rb AS (SELECT vec_id,
        |    row_number() OVER (ORDER BY s2 DESC, vec_id) AS r
        |  FROM s ORDER BY s2 DESC, vec_id LIMIT 20),
        |j AS (SELECT ra.vec_id, ra.r AS r1, rb.r AS r2
        |  FROM ra JOIN rb USING (vec_id)),
        |t AS (SELECT d,
        |    pow(0.9, CAST(d AS DOUBLE) - 1.0) * CAST(ov AS DOUBLE) /
        |      CAST(d AS DOUBLE) AS term
        |  FROM (SELECT u.d,
        |      (SELECT count(*) FROM j WHERE r1 <= u.d AND r2 <= u.d) AS ov
        |    FROM unnest(range(1, 21)) AS u(d)))
        |SELECT CAST(20 AS INT) AS k, 0.9 AS p,
        |  (SELECT count(*) FROM j) AS n_common,
        |  round((1.0 - 0.9) * sum(term), 6) AS rbo
        |FROM t""".stripMargin,

    // The identical rank walk: hist → cumulative window → fences at
    // ranks k+1 and n-k, HUGEINT sums, one final IEEE division chain.
    "q201_winsorized" ->
      """WITH h AS (SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
        |    count(*) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY g, q),
        |r AS (SELECT g, q, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY q
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM h),
        |r2 AS (SELECT g, q, c, hi, n, hi - c + 1 AS lo,
        |    CAST(floor(CAST(n AS DOUBLE) * 0.05) AS BIGINT) AS k
        |  FROM r),
        |a AS (SELECT g, max(n) AS n, max(k) AS k,
        |    sum(CAST(q AS HUGEINT) * CAST(greatest(0,
        |      least(hi, n - k) - greatest(lo, k + 1) + 1) AS HUGEINT))
        |      AS smid,
        |    min(CASE WHEN hi >= k + 1 THEN q END) AS vlo,
        |    min(CASE WHEN hi >= n - k THEN q END) AS vhi
        |  FROM r2 GROUP BY g)
        |SELECT g AS o_orderpriority, n, k,
        |  round(CAST(vlo AS DOUBLE) / 100.0, 6) AS fence_low,
        |  round(CAST(vhi AS DOUBLE) / 100.0, 6) AS fence_high,
        |  CASE WHEN n - 2 * k > 0 THEN
        |    round((CAST(smid AS DOUBLE) / 100.0) /
        |      CAST(n - 2 * k AS DOUBLE), 6) END AS trimmed_mean,
        |  round((CAST(smid + CAST(k AS HUGEINT) * vlo +
        |      CAST(k AS HUGEINT) * vhi AS DOUBLE) / 100.0) /
        |    CAST(n AS DOUBLE), 6) AS winsor_mean
        |FROM a ORDER BY o_orderpriority""".stripMargin,

    "q202_tail_index" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |cnt AS (SELECT w, count(*) AS f FROM tok GROUP BY w),
        |top AS (SELECT w, f FROM cnt ORDER BY f DESC, w ASC LIMIT 100),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(min(f) AS BIGINT) AS fk FROM top),
        |s AS (SELECT max(kk.m) AS m, max(kk.fk) AS fk,
        |    sum(ln(CAST(top.f AS DOUBLE) / CAST(kk.fk AS DOUBLE))) AS lsum
        |  FROM top, kk)
        |SELECT m AS k, fk AS f_kth,
        |  CASE WHEN lsum > 0 THEN
        |    round(CAST(m AS DOUBLE) / lsum, 6) END AS alpha
        |FROM s""".stripMargin,

    // Leading digit from the exact unscaled-cents integer string; the
    // Benford expectation spelled ln(1+1/d)/ln(10) on both engines.
    "q203_benford" ->
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT)
        |    AS digit
        |  FROM v WHERE cents > 0),
        |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
        |t AS (SELECT count(*) AS n FROM d),
        |sp AS (SELECT CAST(u.dd AS INT) AS digit
        |  FROM unnest(range(1, 10)) AS u(dd))
        |SELECT sp.digit, coalesce(c.n_obs, 0) AS n_obs,
        |  round(CAST(coalesce(c.n_obs, 0) AS DOUBLE) / CAST(n AS DOUBLE),
        |    6) AS share,
        |  round(ln(1.0 + 1.0 / CAST(sp.digit AS DOUBLE)) / ln(10.0), 6)
        |    AS benford,
        |  round(CAST(coalesce(c.n_obs, 0) AS DOUBLE) / CAST(n AS DOUBLE) -
        |    ln(1.0 + 1.0 / CAST(sp.digit AS DOUBLE)) / ln(10.0), 6) AS gap,
        |  round(CAST(n AS DOUBLE) *
        |    (CAST(coalesce(c.n_obs, 0) AS DOUBLE) / CAST(n AS DOUBLE) -
        |      ln(1.0 + 1.0 / CAST(sp.digit AS DOUBLE)) / ln(10.0)) *
        |    (CAST(coalesce(c.n_obs, 0) AS DOUBLE) / CAST(n AS DOUBLE) -
        |      ln(1.0 + 1.0 / CAST(sp.digit AS DOUBLE)) / ln(10.0)) /
        |    (ln(1.0 + 1.0 / CAST(sp.digit AS DOUBLE)) / ln(10.0)), 6)
        |    AS chi2_term
        |FROM sp LEFT JOIN c ON c.digit = sp.digit, t
        |ORDER BY sp.digit""".stripMargin,

    "q204_ab_test" ->
      """WITH ent AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS v,
        |    user_id AS e,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY v, e),
        |arms AS (SELECT
        |    CAST(sum(CASE WHEN v = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN v = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN v = 'a' THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(sum(CASE WHEN v = 'b' THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_b
        |  FROM ent)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |    AS rate_a,
        |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |    AS rate_b,
        |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) -
        |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS lift,
        |  round((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) -
        |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) /
        |    sqrt((CAST(conv_a + conv_b AS DOUBLE) /
        |        CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 - CAST(conv_a + conv_b AS DOUBLE) /
        |        CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
        |    AS z
        |FROM arms
        |ORDER BY 1""".stripMargin,

    // DuckDB's own ASOF LEFT JOIN is the oracle — the semantics the
    // custom operator must reproduce exactly.
    "q222_asof_native" ->
      """WITH clicks AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT c.user_id, c.ts, c.event_id, p.purchase_value
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND p.pts <= c.ts
        |ORDER BY c.user_id, c.ts, c.event_id""".stripMargin,

    // Doubled-midrank integer walk mirrors Evaluation.mannWhitney:
    // 2·R_a and the tie term stay HUGEINT; only z/cles divide in IEEE.
    "q223_mann_whitney" ->
      """WITH av AS (SELECT floor(value * 10) AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |bv AS (SELECT floor(value * 10) AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |ga AS (SELECT v, count(*) AS ca FROM av GROUP BY v),
        |gb AS (SELECT v, count(*) AS cb FROM bv GROUP BY v),
        |m AS (SELECT COALESCE(ga.v, gb.v) AS v, COALESCE(ca, 0) AS ca,
        |    COALESCE(cb, 0) AS cb FROM ga FULL OUTER JOIN gb ON ga.v = gb.v),
        |c AS (SELECT v, ca, cb, ca + cb AS t,
        |    COALESCE(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM m),
        |s AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
        |    CAST(sum(cb) AS HUGEINT) AS nb, count(*) AS nv,
        |    CAST(sum(CAST(ca AS HUGEINT) *
        |      (2 * CAST(bef AS HUGEINT) + CAST(t AS HUGEINT) + 1))
        |      AS HUGEINT) AS r2a,
        |    CAST(sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) *
        |      CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS HUGEINT) AS ties
        |  FROM c)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  nv AS n_values,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 END AS u_a,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round((CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0) /
        |      (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) END AS cles,
        |  CASE WHEN na > 0 AND nb > 0 AND
        |      CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
        |        ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) -
        |          CAST(ties AS DOUBLE) /
        |          ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) *
        |            (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0))) > 0
        |    THEN round((CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 -
        |      CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) /
        |      sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
        |        ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) -
        |          CAST(ties AS DOUBLE) /
        |          ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) *
        |            (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0)))), 6)
        |    END AS z
        |FROM s ORDER BY 1""".stripMargin,

    // Exact HUGEINT moment sums per source; dimensionless η²/F outputs
    // mirror Evaluation.anovaF (raw SS magnitudes would expose fold
    // noise past round(,6)).
    "q224_anova" ->
      """WITH g AS (SELECT source AS grp,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
        |      AS HUGEINT) AS q
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY source),
        |f AS (SELECT CAST(sum(n) AS HUGEINT) AS nt, count(*) AS k,
        |    CAST(sum(s) AS HUGEINT) AS st,
        |    sum(CAST(n * q - s * s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * 1.0)) AS ssw,
        |    sum(CAST(s * s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * 1.0)) AS sgn
        |  FROM g)
        |SELECT CAST(nt AS BIGINT) AS n, k,
        |  round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS grand_mean,
        |  CASE WHEN (sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 1.0)) + ssw > 0 THEN
        |    round((sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 1.0)) /
        |      ((sgn - CAST(st * st AS DOUBLE) /
        |        (CAST(nt AS DOUBLE) * 1.0)) + ssw), 6) END AS eta_sq,
        |  CASE WHEN k >= 2 AND CAST(nt AS BIGINT) > k AND ssw > 0 THEN
        |    round(((sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 1.0)) / (CAST(k AS DOUBLE) - 1.0)) /
        |      (ssw / (CAST(nt AS DOUBLE) - CAST(k AS DOUBLE))), 6)
        |    END AS f_stat
        |FROM f ORDER BY 1""".stripMargin,

    // Closed-form Wilson 95% lower bound per group; constants enter as
    // CAST(1.96 AS DOUBLE) products so both engines square in IEEE.
    "q225_wilson_ranking" ->
      """WITH g AS (SELECT event_type AS "group",
        |    count(*) AS trials,
        |    CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS successes
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |w AS (SELECT "group", trials, successes,
        |    CAST(successes AS DOUBLE) / CAST(trials AS DOUBLE) AS p,
        |    CAST(trials AS DOUBLE) AS n,
        |    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
        |  FROM g)
        |SELECT "group", trials, successes, round(p, 6) AS rate,
        |  round(greatest((p + z2 / (2.0 * n) -
        |    CAST(1.96 AS DOUBLE) * sqrt(p * (1.0 - p) / n +
        |      z2 / (4.0 * n * n))) / (1.0 + z2 / n), 0.0), 6) AS wilson_low
        |FROM w ORDER BY wilson_low DESC, "group"""".stripMargin,

    // NTILE axes mirror Sessionize.rfmSegments (1 = best, custkey
    // tie-break); revenue is the exact DECIMAL(18,2) sum cast once.
    "q226_rfm_segments" ->
      """WITH per AS (SELECT o_custkey AS c,
        |    max(CAST(o_orderdate AS DATE)) AS lastd, count(*) AS f,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT max(lastd) AS anchor FROM per),
        |t AS (SELECT c, mon,
        |    CAST(ntile(5) OVER (ORDER BY date_diff('day', lastd, anchor)
        |      ASC, c ASC) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY f DESC, c ASC) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY mon DESC, c ASC) AS INT)
        |      AS m_score
        |  FROM per CROSS JOIN a)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  CAST(sum(mon) AS DOUBLE) AS revenue
        |FROM t GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin,

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

    // Integer count folds mirror CorpusStats.simpsonDiversity; the
    // three ratios divide once in IEEE.
    "q228_simpson_diversity" ->
      """WITH c AS (SELECT source AS grp, w, count(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS w
        |     FROM documents WHERE text IS NOT NULL)
        |  GROUP BY source, w),
        |g AS (SELECT grp, CAST(sum(c) AS HUGEINT) AS n,
        |    count(*) AS n_types,
        |    CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
        |      AS c2,
        |    max(c) AS mx
        |  FROM c GROUP BY grp)
        |SELECT grp AS "group", CAST(n AS BIGINT) AS n_tokens, n_types,
        |  round(CAST(c2 AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS simpson,
        |  round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) /
        |    CAST(c2 AS DOUBLE), 6) AS inv_simpson,
        |  round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS berger_parker
        |FROM g ORDER BY "group"""".stripMargin,

    // Exact cent sums per (segment, customer); HUGEINT Σs²/top-4 folds
    // mirror Profiling.concentration; two IEEE ratios.
    "q229_concentration" ->
      """WITH per AS (SELECT c_mktsegment AS grp, o_custkey AS e,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS s
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IS NOT NULL AND o_custkey IS NOT NULL
        |    AND o_totalprice IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT grp, s, row_number() OVER (PARTITION BY grp
        |    ORDER BY s DESC, e ASC) AS rn FROM per),
        |g AS (SELECT grp, count(*) AS n_entities,
        |    CAST(sum(s) AS HUGEINT) AS t,
        |    CAST(sum(s * s) AS HUGEINT) AS c2,
        |    CAST(sum(CASE WHEN rn <= 4 THEN s ELSE 0 END) AS HUGEINT)
        |      AS tp
        |  FROM r GROUP BY grp)
        |SELECT grp AS "group", n_entities,
        |  round(CAST(c2 AS DOUBLE) /
        |    (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) * 10000.0, 6) AS hhi,
        |  round(CAST(tp AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cr4
        |FROM g ORDER BY "group"""".stripMargin,

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

    // q218's squash; bucketed candidates (b±1 covers the closed
    // caliper interval), (|gap|, control_id) winner per treated.
    "q231_psm_match" ->
      """WITH s AS (SELECT vec_id, label,
        |    greatest(0.0, least(1.0,
        |      round(0.5 + CAST(embedding AS DOUBLE[])[1] / 4.0, 3))) AS p
        |  FROM embeddings),
        |tr AS (SELECT vec_id AS treated_id, p AS t_score,
        |    CAST(floor(p / 0.02) AS BIGINT) AS b FROM s WHERE label >= 5),
        |ct AS (SELECT vec_id AS control_id, p AS c_score,
        |    CAST(floor(p / 0.02) AS BIGINT) AS b
        |  FROM s WHERE NOT label >= 5),
        |cand AS (SELECT treated_id, control_id, t_score, c_score,
        |    abs(t_score - c_score) AS ad
        |  FROM tr JOIN ct ON ct.b BETWEEN tr.b - 1 AND tr.b + 1
        |  WHERE abs(t_score - c_score) <= 0.02),
        |r AS (SELECT treated_id, control_id, t_score, c_score, ad,
        |    row_number() OVER (PARTITION BY treated_id
        |      ORDER BY ad, control_id) AS rn
        |  FROM cand)
        |SELECT treated_id, control_id, t_score, c_score,
        |  round(ad, 6) AS abs_diff
        |FROM r WHERE rn = 1 ORDER BY treated_id""".stripMargin,

    // Per-label scale-6 centroid sums (q176's convention, GROUP BY
    // label); a = own-centroid distance, b = min other; one LEFT JOIN.
    "q232_silhouette" -> {
      val sums = (0 until 64).map(i =>
        s"SUM(CAST(CAST(cv[${i + 1}] AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS s$i")
        .mkString(", ")
      val means = (0 until 64).map(i =>
        s"CAST(s$i AS DOUBLE)/1000000.0/CAST(n AS DOUBLE)").mkString(", ")
      s"""WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE label IS NOT NULL),
         |st AS (SELECT label AS cl, count(*) AS n, $sums
         |  FROM c GROUP BY label),
         |m AS (SELECT cl, [$means] AS mv FROM st),
         |own AS (SELECT vec_id, label,
         |    sqrt(list_dot_product(dv, dv)) AS a FROM (
         |  SELECT vec_id, label,
         |      [cv[i] - mv[i] FOR i IN generate_series(1, 64)] AS dv
         |    FROM c JOIN m ON label = cl)),
         |oth AS (SELECT vec_id, min(sqrt(list_dot_product(dv, dv))) AS b
         |  FROM (
         |  SELECT c.vec_id,
         |      [cv[i] - mv[i] FOR i IN generate_series(1, 64)] AS dv
         |    FROM c JOIN m ON label <> cl) GROUP BY vec_id)
         |SELECT label AS cluster, count(*) AS n,
         |  round(avg(CASE WHEN b IS NULL THEN NULL
         |    WHEN greatest(a, b) = 0 THEN 0.0
         |    ELSE (b - a) / greatest(a, b) END), 6) AS mean_silhouette,
         |  round(avg(a), 6) AS mean_dist_own,
         |  round(avg(b), 6) AS mean_dist_other
         |FROM own LEFT JOIN oth USING (vec_id)
         |GROUP BY label ORDER BY cluster""".stripMargin
    },

    // DuckDB's own jaro_winkler_similarity is the oracle — the exact
    // semantics (0.7 boost gate, prefix cap 4, empty -> 0) the codegen'd
    // expression reproduces.
    "q233_jaro_names" ->
      """WITH base AS (SELECT substring(c_name, 1, length(c_name) - 2)
        |    AS blk, c_custkey AS id, c_name AS name FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM base a JOIN base b USING (blk) WHERE a.id < b.id
        |ORDER BY jw DESC, id_a, id_b LIMIT 50""".stripMargin,

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

    // Mirrors Evaluation.cuped: DECIMAL(18,2)*100 HUGEINT per-unit
    // sums ≡ unscaledLong(scale=2); θ, ρ², and the arm means all read
    // off the same nine exact moments; only the final ratios are IEEE.
    "q236_cuped" ->
      """WITH u AS (SELECT user_id AS u,
        |    CAST(user_id % 2 = 0 AS INT) AS t,
        |    CAST(COALESCE(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) END),
        |      0) AS HUGEINT) AS x,
        |    CAST(COALESCE(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) END),
        |      0) AS HUGEINT) AS y
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY user_id),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(t) AS HUGEINT) AS nt,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy,
        |    CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS HUGEINT) AS sxt,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS HUGEINT) AS syt
        |  FROM u),
        |d AS (SELECT n, nt, sx, sy, sxt, syt,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |    CAST(nt AS DOUBLE) AS ntd, CAST(n - nt AS DOUBLE) AS ncd
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_units, CAST(nt AS BIGINT) AS n_t,
        |  CAST(n - nt AS BIGINT) AS n_c,
        |  CASE WHEN varxn > 0 THEN round(covn / varxn, 6) END AS theta,
        |  CASE WHEN n > 0 THEN round(CAST(sx AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * 100.0), 6) END AS mean_pre,
        |  CASE WHEN nt > 0 AND n > nt THEN
        |    round((CAST(syt AS DOUBLE) / ntd -
        |      CAST(sy - syt AS DOUBLE) / ncd) / 100.0, 6) END AS diff_raw,
        |  CASE WHEN nt > 0 AND n > nt AND varxn > 0 THEN
        |    round((CAST(syt AS DOUBLE) / ntd -
        |        CAST(sy - syt AS DOUBLE) / ncd) / 100.0 -
        |      (covn / varxn) *
        |        ((CAST(sxt AS DOUBLE) / ntd -
        |          CAST(sx - sxt AS DOUBLE) / ncd) / 100.0), 6)
        |    END AS diff_cuped,
        |  CASE WHEN varxn > 0 AND varyn > 0 THEN
        |    round(covn * covn / (varxn * varyn), 6) END AS var_reduction
        |FROM d ORDER BY 1""".stripMargin,

    // Mirrors TimeSeries.olsTrend: HUGEINT moments, slope/intercept as
    // the identical fixed IEEE op sequence, residual lag window over
    // the bounded daily frame.
    "q237_ols_trend" ->
      """WITH dly AS (SELECT event_type AS g,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)
        |      AS sxx,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
        |      AS sxy,
        |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
        |      AS syy
        |  FROM dly GROUP BY g),
        |s AS (SELECT g, n,
        |    CASE WHEN n * sxx - sx * sx > 0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |        CAST(n * sxx - sx * sx AS DOUBLE) END AS b,
        |    (CAST(sy AS DOUBLE) -
        |      (CASE WHEN n * sxx - sx * sx > 0 THEN
        |        CAST(n * sxy - sx * sy AS DOUBLE) /
        |          CAST(n * sxx - sx * sx AS DOUBLE) END) *
        |      CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE) *
        |        CAST(n * sxy - sx * sy AS DOUBLE) /
        |        (CAST(n * sxx - sx * sx AS DOUBLE) *
        |          CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
        |  FROM m),
        |r AS (SELECT dly.g, dly.x,
        |    CAST(dly.y AS DOUBLE) - (s.a + s.b * CAST(dly.x AS DOUBLE)) AS e
        |  FROM dly JOIN s ON dly.g = s.g),
        |rl AS (SELECT g, e,
        |    lag(e) OVER (PARTITION BY g ORDER BY x) AS ep FROM r),
        |d AS (SELECT g, sum(e * e) AS den,
        |    sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) END)
        |      AS num
        |  FROM rl GROUP BY g)
        |SELECT s.g AS "group", CAST(s.n AS BIGINT) AS n,
        |  round(s.b, 6) AS slope, round(s.a, 6) AS intercept,
        |  round(s.r2, 6) AS r2,
        |  CASE WHEN s.n >= 2 AND d.den > 0 THEN round(d.num / d.den, 6)
        |    END AS dw
        |FROM s JOIN d ON s.g = d.g ORDER BY 1""".stripMargin,

    // Mirrors Profiling.ebShrinkMeans: DECIMAL(18,2)*100 quantization,
    // HUGEINT group moments, identical IEEE sequence for sigma2/tau2/B.
    "q238_eb_shrinkage" ->
      """WITH g AS (SELECT p_brand AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
        |      AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
        |        AS HUGEINT) *
        |      CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
        |        AS HUGEINT)) AS HUGEINT) AS q
        |  FROM part WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL
        |  GROUP BY p_brand),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS nd,
        |    CAST(count(*) AS DOUBLE) AS kd,
        |    CAST(sum(s) AS DOUBLE) AS sd,
        |    sum(CAST(q AS DOUBLE) -
        |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS ssw,
        |    sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS ssb2,
        |    sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS n2,
        |    CAST(sum(n) AS BIGINT) AS nn, count(*) AS kk FROM g),
        |p AS (SELECT CASE WHEN kk >= 2 AND nn > kk THEN sd / nd END
        |      AS grand,
        |    CASE WHEN kk >= 2 AND nn > kk THEN ssw / (nd - kd) END AS s2w,
        |    CASE WHEN kk >= 2 AND nn > kk THEN
        |      greatest(0.0, ((ssb2 - sd * sd / nd) / (kd - 1.0) -
        |        ssw / (nd - kd)) / ((nd - n2 / nd) / (kd - 1.0)))
        |      END AS tau2
        |  FROM t),
        |o AS (SELECT g.grp, g.n,
        |    CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE) AS meanu,
        |    p.grand, p.s2w, p.tau2,
        |    CASE WHEN p.tau2 + p.s2w / CAST(g.n AS DOUBLE) > 0 THEN
        |        p.tau2 / (p.tau2 + p.s2w / CAST(g.n AS DOUBLE))
        |      WHEN p.tau2 IS NOT NULL THEN 0.0 END AS b
        |  FROM g CROSS JOIN p)
        |SELECT grp AS "group", n, round(meanu / 100.0, 6) AS mean,
        |  round((grand + b * (meanu - grand)) / 100.0, 6) AS shrunk,
        |  round(b, 6) AS shrink_b
        |FROM o ORDER BY 1""".stripMargin,

    // Mirrors Evaluation.kruskalWallis: exact HUGEINT doubled rank
    // sums on the merged value histogram, IEEE only in H and the tie
    // correction.
    "q239_kruskal_wallis" ->
      """WITH gv AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
        |    count(*) AS c
        |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1, 2),
        |vt AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM gv GROUP BY v),
        |vr AS (SELECT v, t, COALESCE(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM vt),
        |g AS (SELECT gv.g, CAST(sum(gv.c) AS HUGEINT) AS n,
        |    CAST(sum(CAST(gv.c AS HUGEINT) *
        |      (2 * CAST(vr.bef AS HUGEINT) + CAST(vr.t AS HUGEINT) + 1))
        |      AS HUGEINT) AS r2
        |  FROM gv JOIN vr ON gv.v = vr.v GROUP BY gv.g),
        |ti AS (SELECT CAST(sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) *
        |      CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS HUGEINT) AS ties,
        |    count(*) AS nv FROM vr),
        |tt AS (SELECT CAST(sum(n) AS HUGEINT) AS nn, count(*) AS k,
        |    sum(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) /
        |      (4.0 * CAST(n AS DOUBLE))) AS sr
        |  FROM g)
        |SELECT CAST(nn AS BIGINT) AS n, k AS n_groups, ti.nv AS n_values,
        |  CASE WHEN k >= 2 AND nn >= 2 THEN
        |    round(12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)) *
        |      sr - 3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) END AS h,
        |  CASE WHEN k >= 2 AND nn >= 2 AND
        |      1.0 - CAST(ti.ties AS DOUBLE) /
        |        (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) *
        |          CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) > 0 THEN
        |    round((12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)) *
        |        sr - 3.0 * (CAST(nn AS DOUBLE) + 1.0)) /
        |      (1.0 - CAST(ti.ties AS DOUBLE) /
        |        (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) *
        |          CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))), 6)
        |    END AS h_corrected
        |FROM tt CROSS JOIN ti ORDER BY 1""".stripMargin,

    // Mirrors TimeSeries.runsTest: quantile_cont median (same (n-1)p
    // convention as Spark's percentile), exact sign/run counts.
    "q240_runs_test" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |md AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS med
        |  FROM dly),
        |sg AS (SELECT day, CAST(CAST(n AS DOUBLE) > med AS INT) AS s
        |  FROM dly, md WHERE CAST(n AS DOUBLE) <> med),
        |rl AS (SELECT s, lag(s) OVER (ORDER BY day) AS p FROM sg),
        |ag AS (SELECT CAST(sum(s) AS BIGINT) AS n_above,
        |    CAST(sum(1 - s) AS BIGINT) AS n_below,
        |    CAST(sum(CASE WHEN p IS NULL OR p <> s THEN 1 ELSE 0 END)
        |      AS BIGINT) AS runs
        |  FROM rl),
        |d AS (SELECT n_above, n_below, runs,
        |    CAST(n_above AS DOUBLE) AS n1, CAST(n_below AS DOUBLE) AS n0
        |  FROM ag)
        |SELECT n_above, n_below, runs,
        |  CASE WHEN n_above > 0 AND n_below > 0 THEN
        |    round(2.0 * n1 * n0 / (n1 + n0) + 1.0, 6) END AS mu_runs,
        |  CASE WHEN n_above > 0 AND n_below > 0 AND
        |      (2.0 * n1 * n0 / (n1 + n0) + 1.0 - 1.0) *
        |      (2.0 * n1 * n0 / (n1 + n0) + 1.0 - 2.0) / (n1 + n0 - 1.0) > 0
        |    THEN round((CAST(runs AS DOUBLE) -
        |        (2.0 * n1 * n0 / (n1 + n0) + 1.0)) /
        |      sqrt((2.0 * n1 * n0 / (n1 + n0) + 1.0 - 1.0) *
        |        (2.0 * n1 * n0 / (n1 + n0) + 1.0 - 2.0) /
        |        (n1 + n0 - 1.0)), 6) END AS z
        |FROM d ORDER BY 1""".stripMargin,

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

    // The oracle recomputes the view FROM SCRATCH — the delta-refresh
    // identity gamma(base) merge gamma(delta join dim) = gamma(all) is
    // exactly what the hash gate certifies (bitwise, because the
    // measure is an unscaled-long sum).
    "q242_view_refresh" ->
      """SELECT c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Evaluation.blandAltman: exact HUGEINT diff moments over
    // the diff histogram, IEEE bias/SD/limits, integer outside count.
    "q243_bland_altman" ->
      """WITH h AS (SELECT CAST(n_chars AS BIGINT) -
        |      CAST(length(text) AS BIGINT) AS d, count(*) AS c
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CAST(d AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
        |      AS s,
        |    CAST(sum(CAST(d AS HUGEINT) * CAST(d AS HUGEINT) *
        |      CAST(c AS HUGEINT)) AS HUGEINT) AS q
        |  FROM h),
        |l AS (SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
        |    CASE WHEN n >= 2 THEN
        |      sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) -
        |        CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS sd
        |  FROM m),
        |l2 AS (SELECT n, bias, sd, bias - 1.96 * sd AS lo,
        |    bias + 1.96 * sd AS hi FROM l),
        |o AS (SELECT sum(CASE WHEN CAST(h.d AS DOUBLE) < l2.lo OR
        |      CAST(h.d AS DOUBLE) > l2.hi THEN h.c ELSE 0 END) AS outn
        |  FROM h CROSS JOIN l2)
        |SELECT n, round(bias, 6) AS bias, round(sd, 6) AS sd_diff,
        |  round(lo, 6) AS lo_limit, round(hi, 6) AS hi_limit,
        |  CASE WHEN sd IS NOT NULL THEN CAST(outn AS BIGINT) END
        |    AS n_outside,
        |  CASE WHEN sd IS NOT NULL THEN
        |    round(CAST(outn AS DOUBLE) / CAST(n AS DOUBLE), 6) END
        |    AS pct_outside
        |FROM l2 CROSS JOIN o ORDER BY 1""".stripMargin,

    // DuckDB's damerau_levenshtein IS the unrestricted variant the
    // expression implements (probed: CA/ABC=2, ab/ba=1) — integer
    // distances make the top-50 cut engine-exact.
    "q244_damerau_names" ->
      """WITH a AS (SELECT p_brand AS bk, p_size AS sk,
        |    p_partkey AS id_a, p_name AS name_a FROM part),
        |b AS (SELECT p_brand AS bk, p_size AS sk,
        |    p_partkey AS id_b, p_name AS name_b FROM part)
        |SELECT id_a, id_b,
        |  CAST(damerau_levenshtein(name_a, name_b) AS INT) AS dl
        |FROM a JOIN b USING (bk, sk)
        |WHERE id_a < id_b
        |ORDER BY dl ASC, id_a ASC, id_b ASC
        |LIMIT 50""".stripMargin,

    // Mirrors TimeSeries.mannKendall: integer S from the bounded
    // self-join, tie-corrected variance, continuity-corrected z.
    "q245_mann_kendall" ->
      """WITH dly AS (SELECT CAST(ts AS DATE) AS o,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY 1),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(COALESCE(sum(CAST(sign(CAST(b.v - a.v AS DOUBLE))
        |      AS BIGINT)), 0) AS BIGINT) AS s
        |  FROM dly a JOIN dly b ON a.o < b.o),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dly),
        |t AS (SELECT COALESCE(sum(CAST(cnt AS DOUBLE) *
        |      (CAST(cnt AS DOUBLE) - 1.0) *
        |      (2.0 * CAST(cnt AS DOUBLE) + 5.0)), 0.0) AS tsum
        |  FROM (SELECT v, count(*) AS cnt FROM dly GROUP BY v)),
        |f AS (SELECT n, n_pairs, s,
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) *
        |      (2.0 * CAST(n AS DOUBLE) + 5.0) - tsum) / 18.0 AS vars
        |  FROM c CROSS JOIN p CROSS JOIN t)
        |SELECT n, n_pairs, s,
        |  CASE WHEN n >= 2 AND vars > 0 THEN
        |    round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) /
        |        sqrt(vars)
        |      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(vars)
        |      ELSE 0.0 END, 6) END AS z
        |FROM f ORDER BY 1""".stripMargin,

    // Mirrors Evaluation.cochranQ: exact HUGEINT column/row totals,
    // one IEEE ratio.
    "q246_cochran_q" ->
      """WITH r AS (SELECT
        |    CAST(CAST(embedding AS DOUBLE[])[1] > 0 AS INT) AS r1,
        |    CAST(CAST(embedding AS DOUBLE[])[2] > 0 AS INT) AS r2,
        |    CAST(CAST(embedding AS DOUBLE[])[3] > 0 AS INT) AS r3
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(r1) AS HUGEINT) AS t1,
        |    CAST(sum(r2) AS HUGEINT) AS t2,
        |    CAST(sum(r3) AS HUGEINT) AS t3,
        |    CAST(sum(r1 + r2 + r3) AS HUGEINT) AS sr,
        |    CAST(sum(CAST(r1 + r2 + r3 AS HUGEINT) *
        |      CAST(r1 + r2 + r3 AS HUGEINT)) AS HUGEINT) AS sr2
        |  FROM r WHERE r1 IS NOT NULL AND r2 IS NOT NULL
        |    AND r3 IS NOT NULL)
        |SELECT n_items, 3 AS n_raters,
        |  CASE WHEN CAST(3 * sr - sr2 AS DOUBLE) > 0 THEN
        |    round(2.0 * CAST(3 * (t1 * t1 + t2 * t2 + t3 * t3) -
        |        (t1 + t2 + t3) * (t1 + t2 + t3) AS DOUBLE) /
        |      CAST(3 * sr - sr2 AS DOUBLE), 6) END AS q_stat
        |FROM a ORDER BY 1""".stripMargin,

    // Mirrors Curation.rakeWeights: 2 IPF iterations = 4 margin
    // scalings; margin sums are 2-5 doubles so only sub-round(,6)
    // fold noise exists.
    "q247_rake_weights" ->
      """WITH e AS (SELECT event_type, user_id % 2 AS par, ts FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |post AS (SELECT * FROM e
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |pre AS (SELECT * FROM e
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM pre) AS pr,
        |    (SELECT CAST(count(*) AS BIGINT) FROM post) AS po),
        |cells AS (SELECT event_type AS row_key, par AS col_key,
        |    CAST(count(*) AS BIGINT) AS n FROM post GROUP BY 1, 2),
        |rt AS (SELECT row_key, CAST(c AS DOUBLE) * CAST(po AS DOUBLE) /
        |      CAST(pr AS DOUBLE) AS tr
        |  FROM (SELECT event_type AS row_key, CAST(count(*) AS BIGINT) AS c
        |    FROM pre GROUP BY 1) CROSS JOIN tot),
        |ct AS (SELECT col_key, CAST(c AS DOUBLE) * CAST(po AS DOUBLE) /
        |      CAST(pr AS DOUBLE) AS tc
        |  FROM (SELECT par AS col_key, CAST(count(*) AS BIGINT) AS c
        |    FROM pre GROUP BY 1) CROSS JOIN tot),
        |m0 AS (SELECT c.row_key, c.col_key, c.n, CAST(c.n AS DOUBLE) AS m,
        |    rt.tr, ct.tc
        |  FROM cells c JOIN rt USING (row_key) JOIN ct USING (col_key)),
        |r1 AS (SELECT row_key, col_key, n, tr, tc,
        |    CASE WHEN sum(m) OVER (PARTITION BY row_key) > 0 THEN
        |      m * (tr / sum(m) OVER (PARTITION BY row_key)) END AS m
        |  FROM m0),
        |c1 AS (SELECT row_key, col_key, n, tr, tc,
        |    CASE WHEN sum(m) OVER (PARTITION BY col_key) > 0 THEN
        |      m * (tc / sum(m) OVER (PARTITION BY col_key)) END AS m
        |  FROM r1),
        |r2 AS (SELECT row_key, col_key, n, tr, tc,
        |    CASE WHEN sum(m) OVER (PARTITION BY row_key) > 0 THEN
        |      m * (tr / sum(m) OVER (PARTITION BY row_key)) END AS m
        |  FROM c1),
        |c2 AS (SELECT row_key, col_key, n, tr, tc,
        |    CASE WHEN sum(m) OVER (PARTITION BY col_key) > 0 THEN
        |      m * (tc / sum(m) OVER (PARTITION BY col_key)) END AS m
        |  FROM r2)
        |SELECT row_key, col_key, n,
        |  round(CASE WHEN n > 0 THEN m / CAST(n AS DOUBLE) END, 6)
        |    AS weight,
        |  round(m, 6) AS mass
        |FROM c2 ORDER BY row_key, col_key""".stripMargin,

    // The oracle recomputes the FINAL state from scratch (deletes
    // gone, updates applied) — certifying the signed-delta identity;
    // NULL order keys are untouched on both sides.
    "q248_signed_view" ->
      """SELECT c_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) +
        |    CASE WHEN o_orderkey % 7 = 0 THEN CAST(5.00 AS DECIMAL(18,2))
        |      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 10 <> 0 OR o_orderkey IS NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Evaluation.brownForsythe: quantile_cont group medians,
    // exact scale-1 HUGEINT moments on |x - med| (halves at scale 1),
    // anovaF's formula shape with the 10^2-scale descale factor.
    "q249_brown_forsythe" ->
      """WITH md AS (SELECT source AS grp,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |z AS (SELECT d.source AS grp,
        |    CAST(CAST(abs(CAST(d.n_chars AS DOUBLE) - md.med)
        |      AS DECIMAL(18,1)) * 10 AS HUGEINT) AS v
        |  FROM documents d JOIN md ON d.source = md.grp
        |  WHERE d.n_chars IS NOT NULL),
        |g AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(v) AS HUGEINT) AS s,
        |    CAST(sum(v * v) AS HUGEINT) AS q
        |  FROM z GROUP BY grp),
        |f AS (SELECT CAST(sum(n) AS HUGEINT) AS nt, count(*) AS k,
        |    CAST(sum(s) AS HUGEINT) AS st,
        |    sum(CAST(n * q - s * s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * 100.0)) AS ssw,
        |    sum(CAST(s * s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * 100.0)) AS sgn
        |  FROM g)
        |SELECT CAST(nt AS BIGINT) AS n, k,
        |  round(CAST(st AS DOUBLE) / 10.0 / CAST(nt AS DOUBLE), 6)
        |    AS mean_absdev,
        |  CASE WHEN (sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 100.0)) + ssw > 0 THEN
        |    round((sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 100.0)) /
        |      ((sgn - CAST(st * st AS DOUBLE) /
        |        (CAST(nt AS DOUBLE) * 100.0)) + ssw), 6) END AS eta_sq,
        |  CASE WHEN k >= 2 AND CAST(nt AS BIGINT) > k AND ssw > 0 THEN
        |    round(((sgn - CAST(st * st AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * 100.0)) / (CAST(k AS DOUBLE) - 1.0)) /
        |      (ssw / (CAST(nt AS DOUBLE) - CAST(k AS DOUBLE))), 6)
        |    END AS f_stat
        |FROM f ORDER BY 1""".stripMargin,

    // Mirrors TextDedup.duplicatedSpans: per-position 8-gram hashes,
    // distinct-carrier count per gram, gap-and-island merge of
    // consecutive duplicated positions. Integer-exact throughout.
    "q250_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(generate_series(1, greatest(len(t) - 7, 1))) AS p, t
        |  FROM d),
        |g2 AS (SELECT doc_id, p,
        |    md5(array_to_string(t[p:p+7], ' ')) AS h FROM g),
        |f AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |    FROM g2 GROUP BY h) x WHERE nd >= 2),
        |dup AS (SELECT doc_id, p FROM g2 JOIN f USING (h)),
        |isl AS (SELECT doc_id, p, p - row_number()
        |    OVER (PARTITION BY doc_id ORDER BY p) AS island FROM dup)
        |SELECT doc_id, min(p) AS span_start,
        |  max(p) + 7 AS span_end, CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // Mirrors TextDedup.weightedContamination: distinct (doc, 5-gram)
    // frame, integer floor(1e6/df) rarity weights, eval-flagged sums.
    "q256_weighted_contamination" ->
      """WITH tr AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 20 <> 7),
        |ev AS (SELECT string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 20 = 7),
        |tg AS (SELECT DISTINCT doc_id, md5(g) AS h FROM (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(t[i:i+4], ' ')
        |      FOR i IN generate_series(1, greatest(len(t) - 4, 1))])) AS g
        |  FROM tr)),
        |dfc AS (SELECT h, count(*) AS dfn FROM tg GROUP BY h),
        |eg AS (SELECT DISTINCT md5(g) AS h FROM (
        |  SELECT unnest(list_distinct(
        |    [array_to_string(t[i:i+4], ' ')
        |      FOR i IN generate_series(1, greatest(len(t) - 4, 1))])) AS g
        |  FROM ev)),
        |sc AS (SELECT tg.doc_id,
        |    count(*) AS n_grams,
        |    CAST(sum(CASE WHEN eg.h IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_overlap,
        |    sum(CAST(1000000 // dfn AS BIGINT)) AS tw,
        |    sum(CASE WHEN eg.h IS NOT NULL
        |      THEN CAST(1000000 // dfn AS BIGINT) ELSE 0 END) AS ow
        |  FROM tg JOIN dfc ON tg.h = dfc.h
        |  LEFT JOIN eg ON tg.h = eg.h
        |  GROUP BY tg.doc_id)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_overlap,
        |  round(CAST(ow AS DOUBLE) / CAST(tw AS DOUBLE), 6)
        |    AS weighted_share
        |FROM sc WHERE n_overlap >= 1 ORDER BY doc_id""".stripMargin,

    // Mirrors TextDedup.contaminatedSpans: train 5-gram positions whose
    // hash appears in the eval split's distinct gram set, island-merged.
    "q255_contaminated_spans" ->
      """WITH tr AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 20 <> 7),
        |ev AS (SELECT string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 20 = 7),
        |gtr0 AS (SELECT doc_id,
        |    unnest(generate_series(1, greatest(len(t) - 4, 1))) AS p, t
        |  FROM tr),
        |gtr AS (SELECT doc_id, p,
        |    md5(array_to_string(t[p:p+4], ' ')) AS h FROM gtr0),
        |gev0 AS (SELECT unnest(generate_series(1,
        |    greatest(len(t) - 4, 1))) AS p, t FROM ev),
        |gev AS (SELECT DISTINCT md5(array_to_string(t[p:p+4], ' ')) AS h
        |  FROM gev0),
        |hits AS (SELECT doc_id, p FROM gtr JOIN gev USING (h)),
        |isl AS (SELECT doc_id, p, p - row_number()
        |    OVER (PARTITION BY doc_id ORDER BY p) AS island FROM hits)
        |SELECT doc_id, min(p) AS span_start, max(p) + 4 AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // Mirrors TextDedup.sharedSpanOnPairs over the q26 banding: matching
    // 8-gram positions on one diagonal form runs; longest + 7 tokens.
    "q254_shared_spans" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |d8 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |gp AS (SELECT doc_id,
         |    unnest(generate_series(1, greatest(len(t) - 7, 1))) AS p, t
         |  FROM d8),
         |g8 AS (SELECT doc_id, p,
         |    md5(array_to_string(t[p:p+7], ' ')) AS h FROM gp),
         |m AS (SELECT pr.doc_id_a, pr.doc_id_b, ga.p AS pa, gb.p AS pb,
         |    ga.p - gb.p AS diag
         |  FROM pairs pr
         |  JOIN g8 ga ON ga.doc_id = pr.doc_id_a
         |  JOIN g8 gb ON gb.doc_id = pr.doc_id_b AND gb.h = ga.h),
         |isl AS (SELECT doc_id_a, doc_id_b, diag, pa,
         |    pa - row_number() OVER (PARTITION BY doc_id_a, doc_id_b, diag
         |      ORDER BY pa) AS grp
         |  FROM m),
         |runs AS (SELECT doc_id_a, doc_id_b, diag, grp,
         |    count(*) AS run FROM isl GROUP BY 1, 2, 3, 4),
         |agg AS (SELECT doc_id_a, doc_id_b,
         |    CAST(sum(run) AS BIGINT) AS n_shared_grams,
         |    CAST(max(run) + 7 AS BIGINT) AS longest_run_tokens
         |  FROM runs GROUP BY 1, 2)
         |SELECT p.doc_id_a, p.doc_id_b,
         |  CAST(coalesce(a.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
         |  CAST(coalesce(a.longest_run_tokens, 0) AS BIGINT)
         |    AS longest_run_tokens
         |FROM pairs p LEFT JOIN agg a USING (doc_id_a, doc_id_b)
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Mirrors TextDedup.winnowPairs over q96's winnowing selection:
    // distinct fingerprint co-carriers, n_shared >= 3, token Jaccard.
    "q253_winnow_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, [md5(array_to_string(t[i:i+2], ' '))
        |  FOR i IN generate_series(1, greatest(len(t) - 2, 1))] AS gh FROM d),
        |fp AS (SELECT DISTINCT doc_id,
        |  unnest([list_min(gh[i:i+3])
        |    FOR i IN generate_series(1, greatest(len(gh) - 3, 1))]) AS f
        |  FROM g),
        |pairs AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |dtoks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dt
        |  FROM documents)
        |SELECT p.doc_id_a, p.doc_id_b, p.n_shared,
        |  round(CAST(len(list_intersect(da.dt, db.dt)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(da.dt, db.dt))) AS DOUBLE),
        |    6) AS jaccard
        |FROM pairs p
        |JOIN dtoks da ON da.doc_id = p.doc_id_a
        |JOIN dtoks db ON db.doc_id = p.doc_id_b
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Mirrors TextDedup.duplicatedTokenImpact: q250's span CTE chain,
    // running-max interval merge, per-source token accounting.
    "q252_dup_token_impact" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(generate_series(1, greatest(len(t) - 7, 1))) AS p, t
        |  FROM d),
        |g2 AS (SELECT doc_id, p,
        |    md5(array_to_string(t[p:p+7], ' ')) AS h FROM g),
        |f AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |    FROM g2 GROUP BY h) x WHERE nd >= 2),
        |dup AS (SELECT doc_id, p FROM g2 JOIN f USING (h)),
        |isl AS (SELECT doc_id, p, p - row_number()
        |    OVER (PARTITION BY doc_id ORDER BY p) AS island FROM dup),
        |spans AS (SELECT doc_id, min(p) AS s, max(p) + 7 AS e
        |  FROM isl GROUP BY doc_id, island),
        |swept AS (SELECT doc_id, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      IS NULL OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS newgrp
        |  FROM spans),
        |grps AS (SELECT doc_id, s, e,
        |    sum(newgrp) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM swept),
        |ivals AS (SELECT doc_id, min(s) AS s, max(e) AS e
        |  FROM grps GROUP BY doc_id, grp),
        |perdoc AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT)
        |    AS dup_toks FROM ivals GROUP BY doc_id),
        |base AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |  CAST(coalesce(sum(dup_toks), 0) AS BIGINT) AS dup_tokens,
        |  round(CAST(coalesce(sum(dup_toks), 0) AS DOUBLE)
        |    / CAST(sum(n_toks) AS DOUBLE), 6) AS dup_token_share
        |FROM base LEFT JOIN perdoc USING (doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors TextDedup.minhashCalibration over the q26 machinery:
    // component-agreement estimate vs exact token-set Jaccard.
    "q251_minhash_calibration" ->
      s"""WITH $shinglesCte,
         |banded AS (
         |  SELECT doc_id, md5('0' || '|' || sig_0 || '|' || sig_1) AS band FROM sig
         |  UNION ALL
         |  SELECT doc_id, md5('1' || '|' || sig_2 || '|' || sig_3) AS band FROM sig),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         |dtoks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dt
         |  FROM documents),
         |j AS (SELECT p.doc_id_a, p.doc_id_b,
         |    CAST(len(list_intersect(da.dt, db.dt)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(da.dt, db.dt))) AS DOUBLE) AS jacc
         |  FROM pairs p
         |  JOIN dtoks da ON da.doc_id = p.doc_id_a
         |  JOIN dtoks db ON db.doc_id = p.doc_id_b),
         |e AS (SELECT j.doc_id_a, j.doc_id_b, j.jacc,
         |    ((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END) +
         |     (CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END) +
         |     (CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END) +
         |     (CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)) / 4.0 AS est
         |  FROM j
         |  JOIN sig sa ON sa.doc_id = j.doc_id_a
         |  JOIN sig sb ON sb.doc_id = j.doc_id_b)
         |SELECT doc_id_a, doc_id_b, round(est, 6) AS est_jaccard,
         |  round(jacc, 6) AS jaccard, round(abs(est - jacc), 6) AS abs_err
         |FROM e ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Histogram walk in score-desc order; bucket = ceil(cum*10/n) so a
    // score run lands whole in its last rank's bucket.
    "q219_gains_table" ->
      """WITH h AS (SELECT round(CAST(embedding AS DOUBLE[])[1], 2) AS s,
        |    count(*) AS c,
        |    CAST(sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p
        |  FROM embeddings GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS np FROM h),
        |wk AS (SELECT s, c, p,
        |    CAST(sum(c) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum FROM h),
        |b AS (SELECT CAST(ceil(CAST(cum AS DOUBLE) * 10.0 /
        |      CAST(t.n AS DOUBLE)) AS INT) AS bucket,
        |    CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS n_pos,
        |    max(t.n) AS tn, max(t.np) AS tnp
        |  FROM wk, t GROUP BY 1),
        |cb AS (SELECT bucket, n, n_pos, tn, tnp,
        |    CAST(sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_n,
        |    CAST(sum(n_pos) OVER (ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM b)
        |SELECT bucket, n, n_pos,
        |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  cum_n, cum_pos,
        |  CASE WHEN tnp > 0 THEN
        |    round(CAST(cum_pos AS DOUBLE) / CAST(tnp AS DOUBLE), 6)
        |    END AS capture,
        |  CASE WHEN tnp > 0 THEN
        |    round((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
        |      (CAST(tnp AS DOUBLE) / CAST(tn AS DOUBLE)), 6)
        |    END AS cum_lift
        |FROM cb ORDER BY bucket""".stripMargin,

    "q220_entropy_rate" ->
      """WITH c AS (SELECT source, w, count(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS w
        |     FROM documents WHERE text IS NOT NULL)
        |  GROUP BY source, w),
        |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c
        |  GROUP BY source)
        |SELECT c.source, max(n.n) AS n_tokens, count(*) AS n_types,
        |  round(sum(-(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))) /
        |    ln(2.0), 6) AS bits_per_token
        |FROM c JOIN n ON n.source = c.source
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

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

    // Per pair: observed-cell chi2 terms + (n - sum_e) absent mass;
    // V = sqrt(chi2 / (n * (min(r,c) - 1))).
    "q217_cramers_v" -> {
      def pairSql(name: String, ea: String, eb: String) =
        s"""SELECT '$name' AS pair, n, n_a, n_b,
           |  round(chi2, 6) AS chi2,
           |  CASE WHEN least(n_a, n_b) > 1 AND n > 0 THEN
           |    round(sqrt(chi2 / (CAST(n AS DOUBLE) *
           |      CAST(least(n_a, n_b) - 1 AS DOUBLE))), 6) END AS v
           |FROM (
           |  WITH cells AS (SELECT CAST($ea AS VARCHAR) AS a,
           |      CAST($eb AS VARCHAR) AS b, count(*) AS c
           |    FROM documents
           |    WHERE $ea IS NOT NULL AND $eb IS NOT NULL GROUP BY 1, 2),
           |  ra AS (SELECT a, sum(c) AS ra FROM cells GROUP BY a),
           |  rb AS (SELECT b, sum(c) AS rb FROM cells GROUP BY b),
           |  tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
           |  na AS (SELECT count(*) AS n_a FROM ra),
           |  nb AS (SELECT count(*) AS n_b FROM rb)
           |  SELECT tot.n, na.n_a, nb.n_b,
           |    sum((CAST(c AS DOUBLE) -
           |        CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE) /
           |          CAST(tot.n AS DOUBLE)) *
           |      (CAST(c AS DOUBLE) -
           |        CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE) /
           |          CAST(tot.n AS DOUBLE)) /
           |      (CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE) /
           |        CAST(tot.n AS DOUBLE))) +
           |    (CAST(tot.n AS DOUBLE) -
           |      sum(CAST(ra.ra AS DOUBLE) * CAST(rb.rb AS DOUBLE) /
           |        CAST(tot.n AS DOUBLE))) AS chi2
           |  FROM cells JOIN ra ON ra.a = cells.a
           |  JOIN rb ON rb.b = cells.b, tot, na, nb
           |  GROUP BY tot.n, na.n_a, nb.n_b)""".stripMargin
      val lb = "least(CAST(floor(n_chars / 200.0) AS BIGINT), 4)"
      s"""${pairSql("lang_source", "lang", "source")}
         |UNION ALL
         |${pairSql("lang_length", "lang", lb)}
         |UNION ALL
         |${pairSql("source_length", "source", lb)}
         |ORDER BY pair""".stripMargin
    },

    // Window-group-limit: 3 smallest margins per label, (margin, id)
    // tiebreak.
    "q218_uncertainty_sample" ->
      """WITH s AS (SELECT label, vec_id,
        |    greatest(0.0, least(1.0,
        |      round(0.5 + CAST(embedding AS DOUBLE[])[1] / 4.0, 3))) AS p
        |  FROM embeddings),
        |r AS (SELECT label, vec_id, p, abs(p - 0.5) AS m,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY abs(p - 0.5), vec_id) AS rn
        |  FROM s)
        |SELECT label, vec_id, p, round(m, 6) AS margin FROM r
        |WHERE rn <= 3 ORDER BY label, margin, vec_id""".stripMargin,

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

    // Zero-filled (source, top-token) z profiles; zero-variance tokens
    // contribute 0; mean |z gap| per unordered pair.
    "q216_stylometry" ->
      """WITH st AS (SELECT source AS s, w, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  GROUP BY s, w),
        |top AS (SELECT w FROM (SELECT w, sum(c) AS cw FROM st GROUP BY w)
        |  ORDER BY cw DESC, w ASC LIMIT 50),
        |tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY s),
        |spine AS (SELECT tot.s, tot.n, top.w FROM tot CROSS JOIN top),
        |freq AS (SELECT spine.s, spine.w,
        |    CAST(coalesce(st.c, 0) AS DOUBLE) / CAST(spine.n AS DOUBLE)
        |      AS f
        |  FROM spine LEFT JOIN st ON st.s = spine.s AND st.w = spine.w),
        |z AS (SELECT s, w,
        |    CASE WHEN sd > 0 THEN (f - mu) / sd ELSE 0.0 END AS z
        |  FROM (SELECT s, w, f,
        |      avg(f) OVER (PARTITION BY w) AS mu,
        |      sqrt(avg(f * f) OVER (PARTITION BY w) -
        |        avg(f) OVER (PARTITION BY w) *
        |        avg(f) OVER (PARTITION BY w)) AS sd
        |    FROM freq))
        |SELECT a.s AS source_a, b.s AS source_b,
        |  count(*) AS n_tokens,
        |  round(sum(abs(a.z - b.z)) / CAST(count(*) AS DOUBLE), 6)
        |    AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.s < b.s
        |GROUP BY a.s, b.s ORDER BY source_a, source_b""".stripMargin,

    // Unpivot -> (covariate, group) exact sums; SMD one IEEE chain
    // (population variances, pooled by simple average).
    "q212_covariate_balance" ->
      """WITH s AS (
        |  SELECT vec_id % 2 AS t, 'dim1' AS c,
        |    CAST(CAST(CAST(embedding AS DOUBLE[])[1] AS DECIMAL(18,6))
        |      * 1000000 AS HUGEINT) AS q FROM embeddings
        |  UNION ALL
        |  SELECT vec_id % 2, 'dim2',
        |    CAST(CAST(CAST(embedding AS DOUBLE[])[2] AS DECIMAL(18,6))
        |      * 1000000 AS HUGEINT) FROM embeddings
        |  UNION ALL
        |  SELECT vec_id % 2, 'label',
        |    CAST(CAST(CAST(label AS DOUBLE) AS DECIMAL(18,6))
        |      * 1000000 AS HUGEINT) FROM embeddings),
        |cells AS (SELECT c, t, count(*) AS n, sum(q) AS sq,
        |    sum(q * q) AS sqq
        |  FROM s GROUP BY c, t),
        |j AS (SELECT tr.c AS covariate,
        |    CAST(tr.n AS BIGINT) AS n_treat, CAST(ct.n AS BIGINT) AS n_ctrl,
        |    (CAST(tr.sq AS DOUBLE) / 1000000.0) / CAST(tr.n AS DOUBLE)
        |      AS mt,
        |    (CAST(ct.sq AS DOUBLE) / 1000000.0) / CAST(ct.n AS DOUBLE)
        |      AS mc,
        |    CAST(CAST(tr.n AS HUGEINT) * tr.sqq - tr.sq * tr.sq AS DOUBLE)
        |      / (CAST(tr.n AS DOUBLE) * CAST(tr.n AS DOUBLE)
        |        * 1000000.0 * 1000000.0) AS vt,
        |    CAST(CAST(ct.n AS HUGEINT) * ct.sqq - ct.sq * ct.sq AS DOUBLE)
        |      / (CAST(ct.n AS DOUBLE) * CAST(ct.n AS DOUBLE)
        |        * 1000000.0 * 1000000.0) AS vc
        |  FROM (SELECT * FROM cells WHERE t = 1) tr
        |  JOIN (SELECT * FROM cells WHERE t = 0) ct ON ct.c = tr.c)
        |SELECT covariate, n_treat, n_ctrl,
        |  round(mt, 6) AS mean_treat, round(mc, 6) AS mean_ctrl,
        |  CASE WHEN vt + vc > 0 THEN
        |    round((mt - mc) / sqrt((vt + vc) / 2.0), 6) END AS smd
        |FROM j ORDER BY covariate""".stripMargin,

    // Exact decile rank picks ceil(n*k/10) on both sides' histograms.
    "q213_qq_table" ->
      """WITH av AS (SELECT round(o_totalprice, -1) AS v FROM orders
        |  WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |    AND o_totalprice IS NOT NULL),
        |bv AS (SELECT round(o_totalprice, -1) AS v FROM orders
        |  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |    AND o_totalprice IS NOT NULL),
        |ah AS (SELECT v, count(*) AS c FROM av GROUP BY v),
        |ar AS (SELECT v,
        |    CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum FROM ah),
        |an AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ah),
        |bh AS (SELECT v, count(*) AS c FROM bv GROUP BY v),
        |br AS (SELECT v,
        |    CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum FROM bh),
        |bn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM bh),
        |sp AS (SELECT CAST(u.k AS INT) AS quantile
        |  FROM unnest(range(1, 10)) AS u(k)),
        |ark AS (SELECT sp.quantile,
        |    CAST(ceil(CAST(an.n AS DOUBLE) *
        |      CAST(sp.quantile AS DOUBLE) / 10.0) AS BIGINT) AS rk
        |  FROM sp, an),
        |brk AS (SELECT sp.quantile,
        |    CAST(ceil(CAST(bn.n AS DOUBLE) *
        |      CAST(sp.quantile AS DOUBLE) / 10.0) AS BIGINT) AS rk
        |  FROM sp, bn),
        |ac AS (SELECT ark.quantile, min(ar.v) AS value_a
        |  FROM ark LEFT JOIN ar ON ar.cum >= ark.rk
        |  GROUP BY ark.quantile),
        |bc AS (SELECT brk.quantile, min(br.v) AS value_b
        |  FROM brk LEFT JOIN br ON br.cum >= brk.rk
        |  GROUP BY brk.quantile)
        |SELECT ac.quantile, value_a, value_b,
        |  round(value_b - value_a, 6) AS gap
        |FROM ac JOIN bc ON bc.quantile = ac.quantile
        |ORDER BY ac.quantile""".stripMargin,

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

    // Membership = hex digit of md5(key) is even, spelled as an IN
    // list; 16 conditional HUGEINT sums in one pass, least/greatest
    // over the 16 means.
    "q210_subsample_ci" -> {
      val b = 16
      def mem(i: Int) =
        s"substr(md5(CAST(o_orderkey AS VARCHAR)), ${i + 1}, 1) IN " +
          "('0','2','4','6','8','a','c','e')"
      val sums = (0 until b).flatMap(i => Seq(
        s"CAST(sum(CASE WHEN ${mem(i)} THEN 1 ELSE 0 END) AS BIGINT) AS c$i",
        s"CAST(CAST(sum(CASE WHEN ${mem(i)} THEN q ELSE 0 END) * 100 " +
          s"AS HUGEINT) AS DOUBLE) AS s$i"))
      val means = (0 until b).map(i =>
        s"(s$i / 100.0) / CAST(c$i AS DOUBLE)")
      s"""WITH base AS (SELECT o_orderkey,
         |    CAST(o_totalprice AS DECIMAL(18,2)) AS q
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |a AS (SELECT count(*) AS n,
         |    CAST(CAST(sum(q) * 100 AS HUGEINT) AS DOUBLE) AS s,
         |    ${sums.mkString(", ")}
         |  FROM base)
         |SELECT CAST($b AS INT) AS n_resamples, n,
         |  round((s / 100.0) / CAST(n AS DOUBLE), 6) AS mean_full,
         |  round(least(${means.mkString(", ")}), 6) AS ci_low,
         |  round(greatest(${means.mkString(", ")}), 6) AS ci_high
         |FROM a ORDER BY 1""".stripMargin
    },

    // C from the holdout, mu from the target, pi = C^-1 mu in the
    // identical closed-form IEEE order (c11 = 1 - c01, mu1 = 1 - mu0).
    "q211_label_shift" ->
      """WITH e AS (SELECT vec_id,
        |    CAST(CAST(embedding AS DOUBLE[])[1] >= 0 AS BIGINT) AS f,
        |    CAST(label >= 5 AS BIGINT) AS y
        |  FROM embeddings),
        |h AS (SELECT count(*) AS n_holdout,
        |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ny0,
        |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ny1,
        |    CAST(sum(CASE WHEN f = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS h00,
        |    CAST(sum(CASE WHEN f = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS h01,
        |    CAST(sum(CASE WHEN f = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS h10
        |  FROM e WHERE vec_id % 7 = 0),
        |t AS (SELECT count(*) AS n_target,
        |    CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0
        |  FROM e WHERE vec_id % 7 <> 0),
        |m AS (SELECT n_holdout, n_target,
        |    CAST(h00 AS DOUBLE) / CAST(ny0 AS DOUBLE) AS c00,
        |    CAST(h01 AS DOUBLE) / CAST(ny1 AS DOUBLE) AS c01,
        |    CAST(h10 AS DOUBLE) / CAST(ny0 AS DOUBLE) AS c10,
        |    CAST(t0 AS DOUBLE) / CAST(n_target AS DOUBLE) AS mu0
        |  FROM h, t)
        |SELECT n_holdout, n_target,
        |  round(c00 * (1.0 - c01) - c01 * c10, 6) AS det,
        |  round(mu0, 6) AS naive_0,
        |  round(1.0 - mu0, 6) AS naive_1,
        |  round(((1.0 - c01) * mu0 - c01 * (1.0 - mu0)) /
        |    (c00 * (1.0 - c01) - c01 * c10), 6) AS pi_0,
        |  round((c00 * (1.0 - mu0) - c10 * mu0) /
        |    (c00 * (1.0 - c01) - c01 * c10), 6) AS pi_1
        |FROM m ORDER BY 1""".stripMargin,

    // Exact DECIMAL(18,6) cell sums; DiD one IEEE chain from integer
    // sums, first index = treated, second = post.
    "q208_did" ->
      """WITH b AS (SELECT CAST(user_id % 2 AS BIGINT) AS t,
        |    CAST(ts >= TIMESTAMP '2024-01-16 00:00:00' AS BIGINT) AS p,
        |    CAST(value AS DECIMAL(18,6)) AS q
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_00,
        |    CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_01,
        |    CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_10,
        |    CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_11,
        |    CAST(CAST(sum(CASE WHEN t = 0 AND p = 0 THEN q ELSE 0 END)
        |      * 1000000 AS HUGEINT) AS DOUBLE) AS s00,
        |    CAST(CAST(sum(CASE WHEN t = 0 AND p = 1 THEN q ELSE 0 END)
        |      * 1000000 AS HUGEINT) AS DOUBLE) AS s01,
        |    CAST(CAST(sum(CASE WHEN t = 1 AND p = 0 THEN q ELSE 0 END)
        |      * 1000000 AS HUGEINT) AS DOUBLE) AS s10,
        |    CAST(CAST(sum(CASE WHEN t = 1 AND p = 1 THEN q ELSE 0 END)
        |      * 1000000 AS HUGEINT) AS DOUBLE) AS s11
        |  FROM b)
        |SELECT n_00, n_01, n_10, n_11,
        |  round(s00 / 1000000.0 / n_00, 6) AS mean_00,
        |  round(s01 / 1000000.0 / n_01, 6) AS mean_01,
        |  round(s10 / 1000000.0 / n_10, 6) AS mean_10,
        |  round(s11 / 1000000.0 / n_11, 6) AS mean_11,
        |  round((s11 / 1000000.0 / n_11 - s10 / 1000000.0 / n_10) -
        |    (s01 / 1000000.0 / n_01 - s00 / 1000000.0 / n_00), 6) AS did
        |FROM a ORDER BY 1""".stripMargin,

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

    // 0·ln0 = 0 on each side's own KL; the mixture is always positive
    // on observed bins — no epsilon.
    "q206_js_divergence" ->
      """WITH a AS (SELECT CAST(CAST(floor(o_totalprice / 10000.0)
        |      AS BIGINT) AS VARCHAR) AS b, count(*) AS ca
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |    AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |bb AS (SELECT CAST(CAST(floor(o_totalprice / 10000.0)
        |      AS BIGINT) AS VARCHAR) AS b, count(*) AS cb
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |    AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT coalesce(a.b, bb.b) AS b,
        |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM a FULL OUTER JOIN bb ON a.b = bb.b),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b, count(*) AS n_bins FROM m)
        |SELECT n_a, n_b, n_bins,
        |  round(sum(
        |    CASE WHEN ca > 0 THEN
        |      (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) *
        |      ln((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) /
        |        ((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |          CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2.0)) / 2.0
        |      ELSE 0.0 END +
        |    CASE WHEN cb > 0 THEN
        |      (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) *
        |      ln((CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |        ((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |          CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2.0)) / 2.0
        |      ELSE 0.0 END), 6) AS js
        |FROM m, t GROUP BY n_a, n_b, n_bins
        |ORDER BY 1""".stripMargin,

    // Exact ceil((n+1)(1-alpha)) order statistic; (1.0 - 0.1) spelled
    // as the subtraction for the identical IEEE value on both engines.
    "q207_conformal" ->
      """WITH h AS (SELECT round(abs(CAST(embedding AS DOUBLE[])[1]), 2)
        |    AS s, count(*) AS c
        |  FROM embeddings GROUP BY 1),
        |r AS (SELECT s, c,
        |    CAST(sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM h),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |k AS (SELECT n,
        |    CAST(ceil((CAST(n AS DOUBLE) + 1.0) * (1.0 - 0.1)) AS BIGINT)
        |      AS rank FROM t)
        |SELECT k.n, k.rank,
        |  min(CASE WHEN r.cum >= k.rank THEN r.s END) AS threshold
        |FROM r, k GROUP BY k.n, k.rank""".stripMargin,

    "q194_mcnemar" ->
      """WITH s AS (SELECT
        |    CAST(((CAST(floor(CAST(embedding AS DOUBLE[])[1] * 10)
        |      AS BIGINT) % 10) + 10) % 10 = label AS BIGINT) AS a,
        |    CAST(((CAST(floor(CAST(embedding AS DOUBLE[])[2] * 10)
        |      AS BIGINT) % 10) + 10) % 10 = label AS BIGINT) AS b
        |  FROM embeddings),
        |cells AS (SELECT count(*) AS n,
        |    CAST(coalesce(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS both_right,
        |    CAST(coalesce(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS both_wrong,
        |    CAST(coalesce(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS a_only,
        |    CAST(coalesce(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END),
        |      0) AS BIGINT) AS b_only
        |  FROM s)
        |SELECT n, both_right, both_wrong, a_only, b_only,
        |  CASE WHEN a_only + b_only > 0 THEN
        |    round((abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE))
        |        - 1.0) *
        |      (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE)) - 1.0)
        |      / (CAST(a_only AS DOUBLE) + CAST(b_only AS DOUBLE)), 6)
        |    END AS statistic
        |FROM cells
        |ORDER BY 1""".stripMargin,

    "q153_mlm_mask" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |m AS (SELECT doc_id, t, len(t) AS n, range(len(t)) AS idx FROM d)
        |SELECT doc_id,
        |  array_to_string(list_transform(idx, i -> CASE
        |    WHEN ((doc_id * 2654435761 + i) % 20) >= 3 THEN t[CAST(i AS INT) + 1]
        |    WHEN ((doc_id * 40503 + i) % 10) < 8 THEN '[MASK]'
        |    WHEN ((doc_id * 40503 + i) % 10) = 8
        |      THEN t[CAST((doc_id * 97 + i * 31) % n AS INT) + 1]
        |    ELSE t[CAST(i AS INT) + 1] END), ' ') AS input_text,
        |  COALESCE(array_to_string(list_filter(list_transform(idx, i -> CASE
        |    WHEN ((doc_id * 2654435761 + i) % 20) < 3
        |      THEN CAST(i AS VARCHAR) || ':' || t[CAST(i AS INT) + 1]
        |    END), p -> p IS NOT NULL), ' '), '') AS labels,
        |  CAST(len(list_filter(idx, i -> ((doc_id * 2654435761 + i) % 20) < 3
        |    AND ((doc_id * 40503 + i) % 10) < 8)) AS BIGINT) AS n_masked,
        |  CAST(len(list_filter(idx, i -> ((doc_id * 2654435761 + i) % 20) < 3
        |    AND ((doc_id * 40503 + i) % 10) = 8)) AS BIGINT) AS n_random,
        |  CAST(len(list_filter(idx, i -> ((doc_id * 2654435761 + i) % 20) < 3
        |    AND ((doc_id * 40503 + i) % 10) = 9)) AS BIGINT) AS n_kept
        |FROM m ORDER BY doc_id""".stripMargin,

    "q130_kmv_distinct" ->
      s"""WITH tok AS (SELECT source,
         |  unnest(list_distinct(string_split(text, ' '))) AS token
         |  FROM documents),
         |g AS (SELECT source, count(*) AS n_rows,
         |  list_sort(list_distinct(list(md5(token))))[1:32] AS mins
         |  FROM tok GROUP BY source)
         |SELECT source, n_rows, CAST(len(mins) AS BIGINT) AS n_sketch,
         |  ${kmvEstimateSql("mins", 32)} AS est_distinct
         |FROM g ORDER BY source""".stripMargin,

    "q131_profile" -> Seq(
        ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
        ("o_totalprice", "dbl"), ("o_orderdate", "ts"), ("o_orderpriority", "str"))
      .map { case (c, kind) => profileColSql("orders", c, kind, 256) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),

    "q132_join_cardinality" ->
      s"""WITH a AS (SELECT list_sort(list_distinct(list(md5(CAST(o_custkey AS VARCHAR)))))[1:128] AS am FROM orders),
         |b AS (SELECT list_sort(list_distinct(list(md5(CAST(c_custkey AS VARCHAR)))))[1:128] AS bm FROM customer),
         |u AS (SELECT am, bm, list_sort(list_distinct(am || bm))[1:128] AS um FROM a, b),
         |j AS (SELECT am, bm, um,
         |  round(CAST(len(list_filter(um, x -> list_contains(am, x) AND list_contains(bm, x))) AS DOUBLE)
         |    / CAST(len(um) AS DOUBLE), 6) AS jac FROM u)
         |SELECT ${kmvEstimateSql("am", 128)} AS est_left,
         |  ${kmvEstimateSql("bm", 128)} AS est_right,
         |  ${kmvEstimateSql("um", 128)} AS est_union,
         |  jac AS jaccard_est,
         |  round(jac * ${kmvEstimateSql("um", 128)}, 4) AS est_intersect
         |FROM j ORDER BY est_left""".stripMargin,

    "q133_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
        |oldv AS (SELECT * FROM base WHERE o_orderkey % 11 <> 3),
        |newv AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus FROM base WHERE o_orderkey % 11 <> 7),
        |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_custkey ELSE o.o_custkey END AS o_custkey,
        |  CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice ELSE o.o_totalprice END AS o_totalprice,
        |  CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderstatus ELSE o.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       WHEN NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |             AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        |             AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
        |         THEN 'update' END AS change_type
        |  FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey)
        |SELECT * FROM j WHERE change_type IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "q134_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |xs AS (
         |  SELECT query_id, neighbor_id,
         |    ROUND(list_dot_product(qv, cv)
         |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
         |  FROM c, q WHERE query_id <> neighbor_id),
         |exact AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM xs) WHERE rnk <= 3),
         |qb AS (SELECT query_id, qv, ${bucketSql("qv")} AS bucket FROM q),
         |cb AS (SELECT neighbor_id, cv, ${bucketSql("cv")} AS bucket FROM c),
         |as_ AS (
         |  SELECT query_id, neighbor_id,
         |    ROUND(list_dot_product(qv, cv)
         |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
         |  FROM cb JOIN qb USING (bucket) WHERE query_id <> neighbor_id),
         |approx AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM as_) WHERE rnk <= 3)
         |SELECT e.query_id, count(*) AS n_exact,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  round(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "q135_incremental_distinct" ->
      s"""WITH g AS (SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS sum_m,
         |  list_sort(list_distinct(list(md5(CAST(user_id AS VARCHAR)))))[1:64] AS mins
         |  FROM events GROUP BY event_type)
         |SELECT event_type, n, sum_m,
         |  ${kmvEstimateSql("mins", 64)} AS est_distinct
         |FROM g ORDER BY event_type""".stripMargin,

    "q136_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, n AS cn FROM e WHERE vec_id < 8),
        |assign AS (SELECT vec_id, v, n, cell,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY ROUND(list_dot_product(v, cv) / (n * cn), 6) DESC, cell) AS rn
        |  FROM e CROSS JOIN c),
        |m AS (SELECT vec_id, v, n, cell FROM assign WHERE rn = 1),
        |p AS (SELECT a.vec_id AS id_a, min(b.vec_id) AS dup_of
        |  FROM m a JOIN m b ON a.cell = b.cell AND b.vec_id < a.vec_id
        |  WHERE ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) >= 0.3
        |  GROUP BY a.vec_id)
        |SELECT m.vec_id, m.cell, p.id_a IS NOT NULL AS is_dup, p.dup_of
        |FROM m LEFT JOIN p ON m.vec_id = p.id_a
        |ORDER BY m.vec_id""".stripMargin,

    "q137_cdc_dedup" ->
      """WITH b AS (SELECT source, text,
        |  [0] || [i FOR i IN generate_series(8, len(text))
        |          IF substring(md5(substring(text, i - 7, 8)), 1, 1) = '0']
        |      || [len(text)] AS bnds
        |  FROM documents WHERE text IS NOT NULL),
        |ch AS (SELECT source,
        |  unnest([substring(text, bnds[i] + 1, bnds[i + 1] - bnds[i])
        |          FOR i IN generate_series(1, len(bnds) - 1)
        |          IF bnds[i + 1] > bnds[i]]) AS chunk
        |  FROM b)
        |SELECT source, count(*) AS n_chunks,
        |  CAST(count(DISTINCT chunk) AS BIGINT) AS n_distinct,
        |  round(1.0 - CAST(count(DISTINCT chunk) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_ratio,
        |  round(CAST(sum(length(chunk)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_len
        |FROM ch GROUP BY source ORDER BY source""".stripMargin,

    "q138_knn_multiprobe" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |qb0 AS (SELECT query_id, qv, ${bucketSql("qv")} AS b0 FROM q),
         |qb AS (SELECT query_id, qv,
         |  unnest([b0, xor(b0, 1), xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket
         |  FROM qb0),
         |cb AS (SELECT neighbor_id, cv, ${bucketSql("cv")} AS bucket FROM c),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ROUND(list_dot_product(qv, cv)
         |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
         |  FROM cb JOIN qb USING (bucket) WHERE query_id <> neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rank
         |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q144_profile_diff" -> {
      val refT = "(SELECT * FROM orders WHERE o_orderkey % 2 = 0)"
      val curT =
        """(SELECT o_custkey,
          |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
          |       ELSE o_totalprice END AS o_totalprice,
          |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
          |       ELSE o_orderpriority END AS o_orderpriority
          | FROM orders WHERE o_orderkey % 2 = 1)""".stripMargin
      val kinds = Seq(("o_custkey", "int"), ("o_totalprice", "dbl"),
        ("o_orderpriority", "str"))
      def prof(t: String) = kinds
        .map { case (c, kd) => profileColSql(t, c, kd, 256) }
        .mkString("(", "\nUNION ALL\n", ")")
      s"""WITH refp AS ${prof(refT)},
         |curp AS ${prof(curT)}
         |SELECT refp."column" AS "column",
         |  refp.n_rows AS n_ref, curp.n_rows AS n_cur,
         |  round(CAST(curp.n_null AS DOUBLE) / curp.n_rows
         |      - CAST(refp.n_null AS DOUBLE) / refp.n_rows, 6) AS null_delta,
         |  CASE WHEN refp.approx_distinct > 0
         |    THEN round(curp.approx_distinct / refp.approx_distinct, 6)
         |  END AS distinct_ratio,
         |  round(curp.mean_val - refp.mean_val, 6) AS mean_shift
         |FROM refp JOIN curp ON refp."column" = curp."column"
         |ORDER BY "column"""".stripMargin
    },

    "q143_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS key
        |  FROM documents),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks
        |  WHERE key IS NOT NULL)
        |SELECT key, count(*) AS n_rows,
        |  round(CAST(count(*) AS DOUBLE) / n, 6) AS share
        |FROM toks CROSS JOIN t
        |GROUP BY key, n
        |HAVING count(*) * 1000000 >= n * 2000
        |ORDER BY n_rows DESC, key""".stripMargin,

    // Footer-stats oracle: the Spark side derives the per-file envelope
    // from the DATA of its own z-ordered write; DuckDB reads the same
    // files' parquet FOOTERS. INT64 footer stats are exact, so the two
    // must hash-match — a divergence means the audit (or the writer's
    // stats) is lying to the scanner.
    "q142_zorder_skipping" ->
      """WITH m AS (SELECT file_name, row_group_id, row_group_num_rows,
        |    path_in_schema, stats_min_value, stats_max_value
        |  FROM parquet_metadata('/tmp/graft_q142_zorder/t/*.parquet')),
        |rg AS (SELECT file_name, row_group_id,
        |    any_value(row_group_num_rows) AS nr FROM m GROUP BY 1, 2),
        |nf AS (SELECT file_name, CAST(sum(nr) AS BIGINT) AS n_rows
        |  FROM rg GROUP BY 1),
        |pk AS (SELECT file_name,
        |    min(CAST(stats_min_value AS DOUBLE)) AS l_partkey_min,
        |    max(CAST(stats_max_value AS DOUBLE)) AS l_partkey_max
        |  FROM m WHERE path_in_schema = 'l_partkey' GROUP BY 1),
        |sk AS (SELECT file_name,
        |    min(CAST(stats_min_value AS DOUBLE)) AS l_suppkey_min,
        |    max(CAST(stats_max_value AS DOUBLE)) AS l_suppkey_max
        |  FROM m WHERE path_in_schema = 'l_suppkey' GROUP BY 1)
        |SELECT file_name AS file, n_rows, l_partkey_min, l_partkey_max,
        |  l_suppkey_min, l_suppkey_max
        |FROM nf JOIN pk USING (file_name) JOIN sk USING (file_name)
        |ORDER BY file""".stripMargin,

    "q141_profile_by_source" -> Seq(("text", "str"), ("n_chars", "int"))
      .map { case (c, kind) =>
        profileColSql("documents", c, kind, 64, group = Some("source")) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY source, \"column\""),

    "q140_drift_psi" -> {
      val edges = (1 to 9).map(k =>
        s"max(CASE WHEN rn = ceil(n * $k / 10.0) THEN x END) AS e$k").mkString(", ")
      val binExpr = (1 to 9).map(k =>
        s"CASE WHEN x > e$k THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH r AS (SELECT o_totalprice AS x FROM orders
         |  WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
         |c AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
         |             ELSE o_totalprice END AS x
         |  FROM orders WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
         |rk AS (SELECT x, row_number() OVER (ORDER BY x) AS rn,
         |  (SELECT count(*) FROM r) AS n FROM r),
         |e AS (SELECT $edges FROM rk),
         |rb AS (SELECT ($binExpr) AS bin FROM r CROSS JOIN e),
         |cb AS (SELECT ($binExpr) AS bin FROM c CROSS JOIN e),
         |rc AS (SELECT bin, count(*) AS nr FROM rb GROUP BY bin),
         |cc AS (SELECT bin, count(*) AS nc FROM cb GROUP BY bin),
         |base AS (SELECT CAST(i AS INTEGER) AS bin,
         |  coalesce(nr, 0) AS n_ref, coalesce(nc, 0) AS n_cur
         |  FROM generate_series(0, 9) g(i)
         |  LEFT JOIN rc ON rc.bin = i LEFT JOIN cc ON cc.bin = i),
         |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM base)
         |SELECT bin, n_ref, n_cur,
         |  round((greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
         |         - greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6))
         |    * ln(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)
         |         / greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)), 6) AS psi_term
         |FROM base, t ORDER BY bin""".stripMargin
    },

    "q139_record_linkage" ->
      """WITH b AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 13 = 0 THEN c_name || ' jr'
        |       WHEN c_custkey % 3 = 0 THEN lower(replace(c_name, '#', ' '))
        |       ELSE c_name END AS c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN CAST((c_nationkey + 1) % 25 AS INTEGER)
        |       ELSE c_nationkey END AS c_nationkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.01 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment FROM customer WHERE c_custkey % 11 <> 4),
        |l AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb,
        |  (CASE WHEN lower(replace(a.c_name, '#', ' ')) = lower(replace(b.c_name, '#', ' '))
        |        THEN 4.0 ELSE -1.5 END
        |   + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.02 THEN 2.0 ELSE -0.5 END) AS score
        |  FROM customer a JOIN b ON a.c_nationkey = b.c_nationkey
        |    AND a.c_mktsegment = b.c_mktsegment),
        |k AS (SELECT * FROM l WHERE score >= 4.0)
        |SELECT count(*) AS n_links,
        |  CAST(sum(CASE WHEN ka = kb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  (SELECT count(*) FROM b) AS n_true,
        |  round(CAST(sum(CASE WHEN ka = kb THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS precision,
        |  round(CAST(sum(CASE WHEN ka = kb THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM b) AS DOUBLE), 6) AS recall
        |FROM k ORDER BY n_links""".stripMargin
  ) ++ TradeInQueries.oracleSql ++ MediaQueries.oracleSql

  /** Hyperplane-bucket SQL with the LSH planes embedded as double
    * literals (JVM-computed — see the q30 comment). */
  private def bucketSql(v: String): String =
    Similarity.deterministicPlanes(4, 64).zipWithIndex.map { case (p, i) =>
      val lits = p.mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product($v, $lits) >= 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")
}

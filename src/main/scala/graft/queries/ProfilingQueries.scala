package graft.queries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QuerySupport._
import graft.sources.Tables.{load, parallel}
import graft.functions.Timestamps
import graft.functions.TextFunctions
import graft.operators.{CorpusStats, Curation, DataQuality, Dedup, EntityResolution, Graph, IncrementalAgg, Itemsets, Maintenance, Merge, Profiling, Quantization, Relational, Retention, Sessionize, Similarity, TextDedup, TimeSeries}
/** Profiling and data quality: sketch profiles, drift, heavy hitters,
  * cardinality, shard audits, layout, record linkage, checks.
  *
  * One registry entry per operator with its DuckDB oracle SQL
  * (driver contract, SURVEY.md §7); aggregated by
  * [[graft.SparkEntry]]. Bodies moved verbatim from SparkEntry
  * in the round-12 registry split — entry names, plans and
  * oracles are unchanged. */
private[graft] object ProfilingQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Join-key skew audit on the order lines' key — per-key load, share,
    // ratio-to-mean, and the salt factor a salted join would need.
    "q87_skew_audit" -> ((s, d) => {
      Relational.skewAudit(load(s, d, "lineitem"), col("l_orderkey"), topK = 25)
    }),


    // Cross-source 3-gram overlap matrix — the between-domain
    // contamination/syndication audit of a corpus card.
    "q89_source_overlap" -> ((s, d) => {
      TextDedup.sourceOverlap(parallel(load(s, d, "documents")),
          "text", "source", shingleSize = 3)
        .transform(ordered1(_, col("source_a"), col("source_b")))
    }),


    // q89's clone-coverage matrix at winnow-FINGERPRINT cost: the same
    // per-source-pair panel over the winnowed sketch (~2/(w+1) of the
    // gram mass) instead of the full shingle stream — the 100 TB path.
    // Round-16 addition under the substantive-oracle policy (1.71 s
    // measured before building).
    "q272_winnow_coverage" -> ((s, d) => {
      TextDedup.winnowSourceOverlap(parallel(load(s, d, "documents")),
          "text", "source", k = 3, w = 4)
        .transform(ordered1(_, col("source_a"), col("source_b")))
    }),


    // Training-shard balance audit: md5-routed 8-way sharding weighted
    // by token count.
    "q99_shard_audit" -> ((s, d) => {
      Relational.shardAudit(parallel(load(s, d, "documents")),
          col("doc_id"), TextFunctions.tokenCount(col("text")), numShards = 8)
        .transform(ordered1(_, col("shard")))
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
      // parallel(): per-column KMV sketches hash every cell (md5) in the
      // partial pass — CPU-bound, spread before the 1-row agg
      Profiling.profile(parallel(load(s, d, "orders")),
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
      // parallel(): two full md5-sketch profile passes over the scan —
      // CPU-bound partials, spread before the 1-row aggs (round-12 A/B:
      // 0.92 s -> 0.66 s at sf0.1; q141's documents scan was a wash and
      // stays unwrapped)
      val o = parallel(load(s, d, "orders"))
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
  )

  val oracleSql: Map[String, String] = Map(

    "q87_skew_audit" ->
      """WITH c AS (SELECT CAST(l_orderkey AS STRING) AS key, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tt, count(*) AS kk FROM c)
        |SELECT key, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / tt, 6) AS share,
        |  round(CAST(n_rows AS DOUBLE) * kk / tt, 6) AS skew_ratio,
        |  CAST((n_rows * kk + tt - 1) // tt AS BIGINT) AS salt_factor
        |FROM c CROSS JOIN t ORDER BY n_rows DESC, key LIMIT 25""".stripMargin,


    // Mirrors TextDedup.winnowSourceOverlap: the q253 winnow list
    // comprehensions keyed by source, then q89's pair/size/jaccard
    // arithmetic verbatim.
    "q272_winnow_coverage" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT source, [md5(array_to_string(t[i:i+2], ' '))
        |  FOR i IN generate_series(1, greatest(len(t) - 2, 1))] AS gh FROM d),
        |fp AS (SELECT DISTINCT source, unnest([list_min(gh[i:i+3])
        |  FOR i IN generate_series(1, greatest(len(gh) - 3, 1))]) AS f FROM g),
        |sz AS (SELECT source, count(*) AS n FROM fp GROUP BY source),
        |ov AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
        |  round(CAST(n_shared AS DOUBLE) / (za.n + zb.n - n_shared), 6)
        |    AS jaccard
        |FROM ov JOIN sz za ON ov.source_a = za.source
        |        JOIN sz zb ON ov.source_b = zb.source
        |ORDER BY source_a, source_b""".stripMargin,


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


    "q135_incremental_distinct" ->
      s"""WITH g AS (SELECT event_type, count(*) AS n,
         |  CAST(sum(event_id) AS BIGINT) AS sum_m,
         |  list_sort(list_distinct(list(md5(CAST(user_id AS VARCHAR)))))[1:64] AS mins
         |  FROM events GROUP BY event_type)
         |SELECT event_type, n, sum_m,
         |  ${kmvEstimateSql("mins", 64)} AS est_distinct
         |FROM g ORDER BY event_type""".stripMargin,


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
        |FROM k ORDER BY n_links""".stripMargin,
  )
}

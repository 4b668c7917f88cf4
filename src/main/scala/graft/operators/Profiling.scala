package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.expressions.{KMinDistinct, MisraGries}

/** Cardinality estimation and one-pass table profiling — the ingest-side
  * audit operators a 100 TB pipeline runs before anything else touches a
  * new corpus drop (schema drift, null storms, key-cardinality checks).
  *
  * Both operators are built on [[graft.expressions.KMinDistinct]], a KMV
  * (k-minimum-values) distinct sketch: exact `count(distinct x)` carries
  * per-group state proportional to the true cardinality, and multiple
  * distinct aggregates in one pass force Catalyst's Expand (the input is
  * replicated once PER distinct column before the exchange — profiling
  * 10 columns exactly would shuffle the table 10×). The sketch holds k
  * 32-byte hashes per group regardless of cardinality, partial-aggregates
  * map-side, and merges by union-truncate, so a whole-table multi-column
  * profile stays ONE pass with a single 1-row exchange.
  *
  * Estimator (Bar-Yossef et al. 2002): with `arr` the k smallest distinct
  * `md5(x)` values, `est = (k-1) / frac(arr[k])`, where `frac` maps the
  * hash's first 13 hex digits into [0,1). 13 digits = 52 bits: every
  * intermediate is an exact-in-double integer, so any oracle engine
  * summing digit·16^j literals reproduces the double bit-for-bit.
  * Fewer than k distinct values ⇒ the array length is the exact count.
  * Relative error ≈ 1/√(k−2): k=256 ⇒ ~6 %, k=1024 ⇒ ~3 %.
  */
object Profiling {

  /** 2^52 = 16^13, the fraction denominator — kept as an exact literal so
    * oracle SQL can embed the same constant rather than trusting pow(). */
  val Denom52: Double = 4503599627370496.0

  /** Aggregate: sorted array of the k smallest distinct values of `c`. */
  def kminDistinct(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinDistinct(ColumnBridge.expression(c), k).toAggregateExpression())

  /** KMV estimate from a [[kminDistinct]] array of md5 hashes (rounded to
    * 4 decimals; exact when the group has fewer than k distinct values). */
  def kmvEstimate(arr: Column, k: Int): Column = {
    val frac =
      conv(substring(element_at(arr, k), 1, 13), 16, 10).cast("double") /
        lit(Denom52)
    when(size(arr) < k, size(arr).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) / frac, 4))
  }

  /** Aggregate: sorted array of Misra–Gries candidate heavy-hitter keys
    * of `c` with `k` counters (every key with count > N/(k+1) is
    * guaranteed present; the summary's counts are stream-order noise and
    * deliberately not emitted). */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())

  /** EXACT heavy hitters without a full-key shuffle: every key whose
    * row count is at least `minSharePpm` parts-per-million of the table,
    * with its exact count and share.
    *
    * Two bounded passes:
    *   1. candidate pass — ONE aggregation carrying a [[misraGries]]
    *      summary with k = ceil(1e6/minSharePpm) counters plus the row
    *      total. MG guarantees every key with count > N/(k+1) survives,
    *      and k is chosen so N/(k+1) < N·minSharePpm/1e6 ≤ any
    *      qualifying count — the candidate set provably contains every
    *      answer key. State is k entries per partition, merged
    *      associatively; nothing key-cardinality-sized ever shuffles.
    *   2. confirm pass — broadcast the ≤ k candidate keys back over the
    *      table, count ONLY them exactly (a k-entry hash aggregation),
    *      and keep those meeting the exact integer threshold
    *      `count · 1e6 ≥ N · minSharePpm` (DECIMAL—no long overflow at
    *      any N). Stream-order noise in the sketch cannot reach the
    *      output: false candidates are filtered by the exact count, and
    *      true heavy keys are never false-absent by the MG guarantee.
    *
    * Contrast [[graft.operators.Relational.skewAudit]]: that is a top-k
    * by rank over a full groupBy (right when the key cardinality is
    * shuffle-able); this is threshold-exact with bounded state (right
    * when it is not). `minSharePpm ≥ 100` keeps k ≤ 10 000 — the
    * candidate array must broadcast. */
  def heavyHitters(df: DataFrame, key: Column,
      minSharePpm: Long): DataFrame = {
    require(minSharePpm >= 100 && minSharePpm <= 1000000L,
      s"minSharePpm must be in [100, 1e6] (k = ceil(1e6/ppm) counters " +
      s"must stay broadcast-sized): $minSharePpm")
    val k = ((1000000L + minSharePpm - 1) / minSharePpm).toInt
    val keyed = df.select(key.cast("string").as("key"))
    val cand = keyed.agg(
      misraGries(col("key"), k).as("__cand"),
      count(col("key")).as("__n"))
    val candKeys = cand.select(
      explode(col("__cand")).as("key"), col("__n"))
    keyed.join(broadcast(candKeys), Seq("key"))
      .groupBy(col("key"), col("__n"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows").cast(dec38) * lit(1000000L) >=
        col("__n").cast(dec38) * lit(minSharePpm))
      .select(col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("__n"), 6).as("share"))
  }

  /** Per-group approximate distinct count of `value` — one shuffle of
    * k-hash sketch rows per group, never of the data. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        kminDistinct(md5(value.cast("string")), k).as("__kmin"))
      .select(groupCols.map(col) ++ Seq(col("n_rows"),
        size(col("__kmin")).cast("long").as("n_sketch"),
        kmvEstimate(col("__kmin"), k).as("est_distinct")): _*)
  }

  /** Distinct-key overlap between two frames from their KMV sketches —
    * join-cardinality estimation without a join: |A|, |B|, |A∪B| by the
    * KMV estimator, Jaccard from the union sketch (the k smallest
    * combined hashes are a uniform sample of A∪B, so the fraction of
    * them present in BOTH sketches estimates |A∩B|/|A∪B| — Beyer et
    * al. 2007), and |A∩B| as their product. Each side is ONE bounded
    * aggregation; the two 1-row sketches then combine with pure array
    * math. This is the planner's ask — "how many keys will this join
    * match?" — at the cost of two scans and zero shuffled data rows.
    * Exact (not estimated) whenever a side has fewer than k distinct
    * keys, since the sketch then IS the distinct key set. */
  def overlapEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, k: Int): DataFrame = {
    val sa = left.agg(kminDistinct(md5(leftKey.cast("string")), k).as("__a"))
    val sb = right.agg(kminDistinct(md5(rightKey.cast("string")), k).as("__b"))
    val u = slice(array_sort(array_union(col("__a"), col("__b"))), 1, k)
    val inBoth = size(filter(u,
      x => array_contains(col("__a"), x) && array_contains(col("__b"), x)))
    val jac = round(inBoth.cast("double") / size(u).cast("double"), 6)
    sa.crossJoin(broadcast(sb))
      .withColumn("__u", u)
      .select(
        kmvEstimate(col("__a"), k).as("est_left"),
        kmvEstimate(col("__b"), k).as("est_right"),
        kmvEstimate(col("__u"), k).as("est_union"),
        jac.as("jaccard_est"),
        round(jac * kmvEstimate(col("__u"), k), 4).as("est_intersect"))
  }

  /** Population Stability Index drift monitor: how far `current`'s
    * distribution of `valueCol` has moved from `reference`'s — THE
    * standard production gate on feature/score drift between a training
    * snapshot and live data. Reference-side exact quantiles define
    * `bins` equal-population bins; both sides are counted into them and
    * each bin contributes `(p−q)·ln(p/q)` (proportions smoothed at
    * `epsilon` so an empty bin stays finite). Rule of thumb: total PSI
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Scale shape: bin edges come from [[Relational.valuesAtRanks]]'
    * range-partitioned bulk order statistics (a global `Window.orderBy`
    * would run ONE task at any cluster size; the previous shape
    * materialized a rank COLUMN over every reference row and then
    * replayed that whole pipeline inside each downstream broadcast
    * leg — round-13 rework), so the bins−1 edges are extracted with
    * two jobs over one shuffle and re-enter as a 1-row LocalRelation;
    * each side then pays one scan + one tiny aggregation by bin id. */
  def driftPsi(reference: DataFrame, current: DataFrame, valueCol: String,
      bins: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    require(epsilon > 0, "epsilon must be positive")
    val spark = reference.sparkSession
    val r = reference.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val cur = current.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    // value at rank ceil(n·k/bins) — deterministic under ties because all
    // tied ranks hold the same value. Empty reference ⇒ a 0-row edges
    // frame, exactly like the previous groupBy-on-empty shape (the
    // crossJoin below then empties both binned sides).
    // n.toDouble BEFORE the multiply: n * k in Long overflows (and goes
    // negative) for n within Long.MaxValue/bins of 2^63 — theoretical at
    // realistic row counts, free to harden; the double rounding loses
    // nothing the surrounding ceil-to-rank arithmetic could observe
    def edgeRank(n: Long, k: Int): Long =
      math.ceil(n.toDouble * k / bins).toLong
    val (edgeRows, nRef) = Relational.valuesAtRanks(r,
      Seq(col("__x").asc))(n => (1 until bins).map(k => edgeRank(n, k)))
    val edgeSchema = org.apache.spark.sql.types.StructType(
      (1 until bins).map(k => org.apache.spark.sql.types.StructField(
        s"__e$k", org.apache.spark.sql.types.DoubleType, nullable = true)))
    val edgeData: Seq[org.apache.spark.sql.Row] =
      if (edgeRows.isEmpty) Seq.empty
      else Seq(org.apache.spark.sql.Row.fromSeq((1 until bins).map(k =>
        java.lang.Double.valueOf(
          edgeRows(edgeRank(nRef, k)).getDouble(0)))))
    val edges = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(edgeData).asJava),
      edgeSchema)
    def binned(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(edges))
        .select((1 until bins).map(k =>
          when(col("__x") > col(s"__e$k"), 1).otherwise(0))
          .reduce(_ + _).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    // localized (round 17): `joined` is `bins` rows by construction, but
    // the totals frame below re-enters as a broadcast leg — without the
    // localization that leg REPLAYS both binned corpus scans (the
    // OpsUtil.localized lineage-replay class; this query ran the data
    // passes twice for a 10-row output)
    val joined = OpsUtil.localized(spine
      .join(binned(r).withColumnRenamed("n", "n_ref"), Seq("bin"), "left")
      .join(binned(cur).withColumnRenamed("n", "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur")),
      maxRows = 100000, context = "driftPsi bin table (bins rows)")
    val tot = joined.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val p = greatest(col("n_ref").cast("double") / col("__tr").cast("double"), lit(epsilon))
    val q = greatest(col("n_cur").cast("double") / col("__tc").cast("double"), lit(epsilon))
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
  }

  /** Engine-portable hash key per type family, so the sketch (and any
    * oracle recomputing it) sees identical strings:
    * integrals/strings render canonically everywhere; doubles are
    * quantized through DECIMAL(18,6) (raw double→string formatting is
    * engine-specific); timestamps go through exact epoch micros. */
  private def hashKey(c: Column, dt: DataType): Column = dt match {
    case _: StringType => c
    case _: DoubleType | _: FloatType =>
      // DECIMAL(30,6), not (18,6): a (18,6) cast overflows to null at
      // |v| >= 1e12 under non-ANSI mode, silently DROPPING the value
      // from the distinct sketch (round-8 advice finding). (30,6) holds
      // |v| < 1e24 — beyond a double's exact-integer range; rendering is
      // scale-driven so in-range strings are unchanged.
      c.cast(DecimalType(30, 6)).cast("string")
    case _: TimestampType | _: TimestampNTZType =>
      unix_micros(c.cast("timestamp")).cast("string")
    case _ => c.cast("string")
  }

  /** Numeric rendering for min/max/mean: integrals and doubles as-is,
    * timestamps as epoch micros (exact in double to 2^53 µs ≈ 2255 CE). */
  private def numVal(c: Column, dt: DataType): Column = dt match {
    case _: TimestampType | _: TimestampNTZType =>
      unix_micros(c.cast("timestamp")).cast("double")
    case _: NumericType => c.cast("double")
    case _ => lit(null).cast("double")
  }

  private val dec38 = DecimalType(38, 0)

  /** Exact floor division over integral decimals (remainder removed
    * before dividing, so the quotient is exact — same construction as
    * [[CorpusStats.mixturePlan]]). */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast(dec38)

  /** The column's value as an exact scaled integer for the mean: numerics
    * quantized to 10^-6 (×10^6), timestamps as raw epoch micros. All mean
    * arithmetic stays in exact DECIMAL(38,0) integers until one final
    * small-magnitude double conversion — a double SUM would be
    * partition-order-dependent, and even an exact wide sum diverges
    * across engines the moment it exceeds 2^53 and each converts to
    * double its own way (measured: the epoch-micros mean differed in the
    * 16th digit between conversions of the same exact 1.3e19 sum). */
  private def meanScaled(c: Column, dt: DataType): (Column, Long) = dt match {
    case _: TimestampType | _: TimestampNTZType =>
      (unix_micros(c.cast("timestamp")).cast(dec38), 1L)
    // Integral types need no 1e-6 quantum hop through a narrow decimal:
    // the old DECIMAL(18,6) cast overflowed to null at |v| >= 1e12
    // (e.g. an epoch-micros long column), silently dropping rows from
    // the mean's sum while they stayed in the non-null denominator
    // (round-8 advice finding). A direct ×1e6 in DECIMAL(38,0) is exact
    // over the full long range.
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
      ((c.cast(dec38) * lit(1000000L)).cast(dec38), 1000000L)
    // Fractional types: quantize at 1e-6 through DECIMAL(30,6) —
    // |v| < 1e24 (beyond a double's exact-integer range); ×1e6 fits
    // DECIMAL(38,0). Doubles past 1e24 would still null-overflow; that
    // magnitude carries no sub-unit information to quantize anyway.
    case _: NumericType =>
      ((c.cast(DecimalType(30, 6)) * lit(1000000L)).cast(dec38), 1000000L)
    case _ => (lit(null).cast(dec38), 1L)
  }

  /** One-pass multi-column profile: one row per column with row/null
    * counts, the KMV distinct estimate, numeric min/max/mean (mean
    * computed in exact integer arithmetic — see [[meanScaled]] — with
    * half-up rounding at 6 decimals for numerics / 1 µs for timestamps),
    * and string length stats. Columns must be numeric, string, or
    * timestamp.
    *
    * Plan shape: ONE aggregation over one scan — a 2-stage global agg
    * whose final exchange carries a single row of bounded-size sketches;
    * `inline` then unpacks it to the per-column report. No Expand, no
    * per-column passes, no distinct shuffle of data rows. */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame =
    profileBy(df, Seq.empty, cols, k)

  /** Snapshot-to-snapshot profile drift — the per-COLUMN complement of
    * [[driftPsi]]'s per-distribution view: run the one-pass profiler on
    * both snapshots and report, per column, row counts, the null-ratio
    * delta, the distinct-estimate ratio, and the mean shift. The first
    * gate a daily-feed regression check runs: a jumped null ratio or a
    * collapsed distinct count is a broken upstream extract long before
    * any model metric moves.
    *
    * Scale shape: exactly two [[profile]] aggregations (one scan each,
    * bounded sketch state, no Expand) and a |cols|-row join. All deltas
    * are single IEEE ops over the profiler's already-engine-exact
    * values, so the report is oracle-reproducible. */
  def profileDiff(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      k: Int = 256): DataFrame = {
    def slim(df: DataFrame, suffix: String): DataFrame =
      profile(df, cols, k).select(col("column"),
        col("n_rows").as(s"__n$suffix"),
        col("n_null").as(s"__nn$suffix"),
        col("approx_distinct").as(s"__d$suffix"),
        col("mean_val").as(s"__m$suffix"))
    slim(ref, "r").join(slim(cur, "c"), Seq("column"))
      .select(col("column"),
        col("__nr").as("n_ref"), col("__nc").as("n_cur"),
        round(col("__nnc").cast("double") / col("__nc") -
          col("__nnr").cast("double") / col("__nr"), 6).as("null_delta"),
        when(col("__dr") > 0,
          round(col("__dc") / col("__dr"), 6)).as("distinct_ratio"),
        round(col("__mc") - col("__mr"), 6).as("mean_shift"))
  }

  /** [[profile]] stratified by `groupCols` — one report row per (group,
    * column): the per-source / per-shard audit form. Identical plan
    * shape: still ONE aggregation (now keyed), still sketch-bounded
    * state per group, still no Expand.
    *
    * State envelope: each (group × column) holds 7 fixed agg buffers
    * plus a k-entry md5-hex sketch ≈ `k×48 + 112` bytes — ~12.4 KiB at
    * the default k=256, so per-executor aggregation state is
    * `groups/executors × |cols| × 12.4 KiB` before spill. A 1M-group
    * stratification over 10 columns is ~124 GiB of total state — a
    * wrong-key mistake, not a profile. `maxGroups` fails fast on it: a
    * cheap HLL pre-pass over just the group columns (one narrow scan,
    * no shuffle beyond a 1-row agg) estimates the group cardinality and
    * raises with the formula instead of letting the real aggregation
    * OOM-or-spill its way through. Set `maxGroups = 0` to skip the
    * pre-pass (e.g. when the caller already knows the cardinality). */
  def profileBy(df: DataFrame, groupCols: Seq[String], cols: Seq[String],
      k: Int = 256, maxGroups: Long = 2000000L): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    if (groupCols.nonEmpty && maxGroups > 0) {
      // ±2% HLL error is irrelevant at guard granularity; the pre-pass
      // scans only the group columns (column pruning keeps it narrow)
      val est = df.select(approx_count_distinct(
        struct(groupCols.map(col): _*)).as("g")).collect().head.getLong(0)
      val perGroupBytes = cols.size.toLong * (k.toLong * 48 + 112)
      require(est <= maxGroups,
        s"profileBy: ~$est groups x ${cols.size} columns ~= " +
        s"${est * perGroupBytes / (1L << 20)} MiB aggregation state " +
        s"(k=$k => ~$perGroupBytes bytes/group) exceeds maxGroups=$maxGroups; " +
        "stratify on a coarser key, raise maxGroups, or pass maxGroups=0 " +
        "to skip this guard")
    }
    val schema = df.schema
    cols.foreach { c =>
      val dt = schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt.isInstanceOf[StringType] ||
          dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType],
        s"profile: unsupported type for $c: $dt")
    }
    val aggs = cols.flatMap { c =>
      val dt = schema(c).dataType
      val isStr = dt.isInstanceOf[StringType]
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nnull"),
        kminDistinct(md5(hashKey(col(c), dt)), k).as(s"__${c}__kmin"),
        min(numVal(col(c), dt)).as(s"__${c}__min"),
        max(numVal(col(c), dt)).as(s"__${c}__max"),
        sum(meanScaled(col(c), dt)._1).as(s"__${c}__sum"),
        (if (isStr) min(length(col(c))).cast("long") else lit(null).cast("long"))
          .as(s"__${c}__minlen"),
        (if (isStr) max(length(col(c))).cast("long") else lit(null).cast("long"))
          .as(s"__${c}__maxlen"))
    }
    val one = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val reports = cols.map { c =>
      val dt = schema(c).dataType
      val quantum = meanScaled(col(c), dt)._2
      val nonNull = (col("n_rows") - col(s"__${c}__nnull")).cast(dec38)
      // round-half-up of S/n in pure integers: floor((2S + n) / 2n).
      // The final decimal→double conversion rounds the same exact
      // integer to the same IEEE double in both engines (nearest-even),
      // and the /quantum division is a single further IEEE op — so the
      // result is engine-independent even when the scaled mean exceeds
      // 2^53 (large-magnitude columns after the round-9 widening).
      val meanInt = floorDiv(
        col(s"__${c}__sum") * lit(2) + nonNull, nonNull * lit(2))
      struct(
        lit(c).as("column"),
        col("n_rows").as("n_rows"),
        col(s"__${c}__nnull").as("n_null"),
        kmvEstimate(col(s"__${c}__kmin"), k).as("approx_distinct"),
        col(s"__${c}__min").as("min_val"),
        col(s"__${c}__max").as("max_val"),
        when(nonNull > 0, meanInt.cast("double") / lit(quantum.toDouble))
          .as("mean_val"),
        col(s"__${c}__minlen").as("min_len"),
        col(s"__${c}__maxlen").as("max_len"))
    }
    one.select(groupCols.map(col) :+ inline(array(reports: _*)): _*)
  }

  /** Chi-square independence audit of two categorical columns — the
    * bias check a corpus card runs ("is language independent of source,
    * or does one crawl carry all the Chinese?"). Emits the FULL
    * contingency spine (every a×b combination, zero-filled — omitting
    * empty cells would understate the statistic) with observed count,
    * expected count under independence, and the cell's chi-square term;
    * the term sum is the test statistic with (|a|-1)(|b|-1) degrees of
    * freedom.
    *
    * Scale shape: one hash aggregation to |a|·|b| cells + two marginal
    * aggregations + a 1-row total, all broadcast onto the bounded spine.
    * Expected counts and terms are single IEEE sequences from exact
    * longs — oracle-reproducible. */
  def contingencyChi2(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n_obs"))
    val rowT = df.groupBy(col(aCol)).agg(count(lit(1)).as("__rt"))
    val colT = df.groupBy(col(bCol)).agg(count(lit(1)).as("__ct"))
    val total = df.agg(count(lit(1)).as("__n"))
    val e = col("__rt").cast("double") * col("__ct").cast("double") /
      col("__n").cast("double")
    val o = coalesce(col("n_obs"), lit(0L)).cast("double")
    rowT.crossJoin(colT)
      .join(obs, Seq(aCol, bCol), "left")
      .crossJoin(broadcast(total))
      .select(col(aCol), col(bCol),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        round(e, 6).as("expected"),
        round((o - e) * (o - e) / e, 6).as("chi2_term"))
  }

  /** Winsorized and trimmed means with exact order-statistic fences —
    * the robust location estimates a metrics pipeline swaps in when a
    * handful of corrupted magnitudes would drag a plain mean ("mean
    * order value" with one 10^9 typo in the batch). `k = floor(alpha·n)`
    * values are fenced at EACH end; the trimmed mean drops them, the
    * winsorized mean clamps them to the fence values (ranks k+1 and
    * n−k, 1-based — spelled so any SQL oracle selects the same
    * integers).
    *
    * Returns one row per group: `(group, n, k, fence_low, fence_high,
    * trimmed_mean, winsor_mean)`; trimmed_mean NULL when n − 2k = 0.
    * NULL values are excluded. Values quantize at `scale`
    * ([[graft.functions.Decimals]]); every sum is an exact DECIMAL(38,0)
    * integer and each mean is one final IEEE sequence.
    *
    * Scale shape: ONE scan into a (group, value) histogram (map-side
    * combined, bounded by the quantized value domain per group — the
    * [[CorpusStats.lengthOutliers]] plan family); the rank walk is one
    * cumulative window over that bounded frame (the group total rides
    * the same exchange); fences and sums fold in a single per-group
    * aggregation. No row-level window, no second scan. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: Column,
      alpha: Double, scale: Int = 6): DataFrame = {
    require(alpha >= 0 && alpha < 0.5, s"alpha must be in [0, 0.5): $alpha")
    val dec38 = DecimalType(38, 0)
    val pow = math.pow(10, scale)
    val hist = df
      .select(col(groupCol).as("__g"),
        graft.functions.Decimals.unscaledLong(valueCol, scale).as("__q"))
      .filter(col("__q").isNotNull)
      .groupBy(col("__g"), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__q").asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"))
    val ranked = hist
      .withColumn("__hi", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lo", col("__hi") - col("__c") + 1)
      .withColumn("__k",
        floor(col("__n").cast("double") * lit(alpha)).cast("long"))
    val midCnt = greatest(lit(0L),
      least(col("__hi"), col("__n") - col("__k")) -
        greatest(col("__lo"), col("__k") + 1) + 1)
    val agg = ranked.groupBy(col("__g"))
      .agg(max(col("__n")).as("n"), max(col("__k")).as("k"),
        sum(col("__q").cast(dec38) * midCnt.cast(dec38)).as("__smid"),
        min(when(col("__hi") >= col("__k") + 1, col("__q"))).as("__vlo"),
        min(when(col("__hi") >= col("__n") - col("__k"), col("__q")))
          .as("__vhi"))
    val trimmedN = col("n") - lit(2L) * col("k")
    val wsum = col("__smid") + col("k").cast(dec38) * col("__vlo").cast(dec38) +
      col("k").cast(dec38) * col("__vhi").cast(dec38)
    agg.select(col("__g").as(groupCol), col("n"), col("k"),
      round(col("__vlo").cast("double") / lit(pow), 6).as("fence_low"),
      round(col("__vhi").cast("double") / lit(pow), 6).as("fence_high"),
      when(trimmedN > 0,
        round((col("__smid").cast("double") / lit(pow)) /
          trimmedN.cast("double"), 6)).as("trimmed_mean"),
      round((wsum.cast("double") / lit(pow)) / col("n").cast("double"), 6)
        .as("winsor_mean"))
  }

  /** Benford first-digit audit over a positive money/measure column —
    * the cheap fabrication screen: organically-generated magnitudes
    * follow `P(d) = log10(1 + 1/d)`, hand-entered or synthesized ones
    * don\'t. Returns the zero-filled digit spine 1–9 with
    * `(digit, n_obs, share, benford, gap, chi2_term)`; `chi2_term` =
    * `n·(share − benford)²/benford` so the suite sums to the audit
    * statistic. Non-positive and NULL values are excluded (no leading
    * digit).
    *
    * The digit is extracted from the value\'s EXACT unscaled integer
    * rendering (quantize at `scale` → long → string → first char) —
    * never via log10/pow, whose boundary rounding (log10(1000) just
    * under 3) misclassifies exact powers of ten on some libms.
    *
    * Scale shape: per-row projection into one bounded (≤ 9 group) hash
    * aggregation; the spine is a 9-row range broadcast. */
  def benfordAudit(df: DataFrame, valueCol: Column,
      scale: Int = 2): DataFrame = {
    val cents = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val digits = df
      .select(cents.as("__u"))
      .filter(col("__u").isNotNull && col("__u") > 0)
      .select(substring(col("__u").cast("string"), 1, 1).cast("int")
        .as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("__c"))
    val total = digits.agg(count(lit(1)).as("__n"))
    val spine = df.sparkSession.range(1, 10).toDF("digit")
      .select(col("digit").cast("int").as("digit"))
    val share = coalesce(col("__c"), lit(0L)).cast("double") /
      col("__n").cast("double")
    val benford = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    spine.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("__c"), lit(0L)).as("n_obs"),
        round(share, 6).as("share"), round(benford, 6).as("benford"),
        round(share - benford, 6).as("gap"),
        round(col("__n").cast("double") * (share - benford) *
          (share - benford) / benford, 6).as("chi2_term"))
  }

  /** Deterministic half-subsample confidence envelope for the mean —
    * the "how stable is this corpus statistic?" answer a pipeline wants
    * WITHOUT nondeterministic RNG: resample `b` is the rows whose md5
    * hex digit `b` is even, giving `nResamples` overlapping ~half
    * samples whose means' spread brackets the sampling noise
    * (subsampling a la Politis–Romano, replication-exact on both
    * engines because membership is a pure hash predicate).
    *
    * Returns one row `(n_resamples, n, mean_full, ci_low, ci_high)` —
    * the envelope is the min/max of the resample means; NULL bounds if
    * any resample is empty (tiny inputs). Values quantize at `scale`;
    * every sum is exact and each mean one IEEE sequence.
    *
    * Scale shape: ONE map-side-combined 1-row aggregation carrying
    * 2·nResamples+2 buffers — membership never materializes, nothing
    * explodes, no second scan. */
  def subsampleCI(df: DataFrame, idCol: Column, valueCol: Column,
      nResamples: Int = 32, scale: Int = 6): DataFrame = {
    require(nResamples >= 2 && nResamples <= 32,
      s"nResamples must be in [2,32] (md5 has 32 hex digits): $nResamples")
    val dec38 = DecimalType(38, 0)
    val pow = math.pow(10, scale)
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val h = md5(idCol.cast("string"))
    val base = df.select(h.as("__h"), q.as("__q"))
      .filter(col("__q").isNotNull)
    def member(i: Int): Column =
      conv(substring(col("__h"), i + 1, 1), 16, 10).cast("long") % 2 === 0
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("__q")).cast(dec38).as("__s")) ++
      (0 until nResamples).flatMap(i => Seq(
        sum(member(i).cast("long")).as(s"__c$i"),
        sum(when(member(i), col("__q")).otherwise(0L)).cast(dec38)
          .as(s"__s$i")))
    val agg = base.agg(aggs.head, aggs.tail: _*)
    def mean(sc: Column, cn: Column): Column =
      (sc.cast("double") / lit(pow)) / cn.cast("double")
    val means = (0 until nResamples).map(i =>
      mean(col(s"__s$i"), col(s"__c$i")))
    val allNonEmpty = (0 until nResamples)
      .map(i => col(s"__c$i") > 0).reduce(_ && _)
    agg.select(lit(nResamples).as("n_resamples"), col("n"),
      when(col("n") > 0, round(mean(col("__s"), col("n")), 6))
        .as("mean_full"),
      when(allNonEmpty, round(least(means: _*), 6)).as("ci_low"),
      when(allNonEmpty, round(greatest(means: _*), 6)).as("ci_high"))
  }

  /** Cramér's V association panel over categorical column pairs — the
    * normalized-to-[0,1] strength read on top of
    * [[contingencyChi2]]'s per-cell terms: for each pair,
    * `V = √(χ² / (n·(min(r,c) − 1)))`. The schema-wide "which
    * categoricals are redundant / entangled" screen a feature audit
    * runs before encoding.
    *
    * Returns one row per ordered input pair `(col_a, col_b, n, n_a,
    * n_b, chi2, v)`; V NULL when either column is constant (min−1 = 0
    * — association undefined). NULL category values are excluded per
    * pair.
    *
    * Scale shape: per pair, one bounded (a, b) contingency aggregation
    * with marginals derived from it — the chi2 fold never touches row
    * count after the first collapse; the pair list is caller-bounded. */
  def cramersV(df: DataFrame, pairs: Seq[(String, Column, Column)])
      : DataFrame = {
    require(pairs.nonEmpty, "cramersV needs at least one pair")
    require(pairs.map(_._1).distinct.size == pairs.size,
      "pair names must be unique")
    val results = pairs.map { case (name, ca, cb) =>
      val cells = df
        .select(ca.cast("string").as("__a"), cb.cast("string").as("__b"))
        .filter(col("__a").isNotNull && col("__b").isNotNull)
        .groupBy(col("__a"), col("__b"))
        .agg(count(lit(1)).as("__c"))
      val ra = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ra"))
      val rb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__rb"))
      val tot = cells.agg(sum(col("__c")).as("n"))
      val na = ra.agg(count(lit(1)).as("n_a"))
      val nb = rb.agg(count(lit(1)).as("n_b"))
      val e = col("__ra").cast("double") * col("__rb").cast("double") /
        col("n").cast("double")
      val o = col("__c").cast("double")
      // observed cells contribute (o−e)²/e; EVERY ABSENT cell of the
      // full r×c spine contributes e, and Σ_all e = n, so the absent
      // mass is n − Σ_obs e — no spine materialization needed
      val chi2 = cells
        .join(broadcast(ra), Seq("__a"))
        .join(broadcast(rb), Seq("__b"))
        .crossJoin(broadcast(tot))
        .agg(sum((o - e) * (o - e) / e).as("__terms"),
          sum(e).as("__esum"), max(col("n")).as("n"))
        .select(col("n"),
          (col("__terms") + (col("n").cast("double") - col("__esum")))
            .as("__chi2"))
      chi2.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .select(lit(name).as("pair"), col("n"), col("n_a"), col("n_b"),
          round(col("__chi2"), 6).as("chi2"),
          when(least(col("n_a"), col("n_b")) > 1 && col("n") > 0,
            round(sqrt(col("__chi2") / (col("n").cast("double") *
              (least(col("n_a"), col("n_b")) - 1).cast("double"))), 6))
            .as("v"))
    }
    results.reduce(_.unionByName(_))
  }

  /** Side-by-side quantile table for two snapshots — the Q-Q read that
    * says WHERE a distribution moved, where [[driftPsi]]/`jsDivergence`
    * say only how much and [[Evaluation.ksTwoSample]] only the largest
    * gap. For k = 1..quantiles−1 the k-th cut is the exact order
    * statistic at rank `ceil(n·k/quantiles)` on each side (any SQL
    * oracle selects the same values). Returns
    * `(quantile, value_a, value_b, gap)`; a side's cut is NULL when
    * that side is empty. NULL values are excluded.
    *
    * Scale shape: each side collapses to its value histogram (bounded
    * — callers quantize, the [[Evaluation.aucBinary]] convention); ONE
    * cumulative window per side; the quantile spine is a bounded
    * cross join; rank picks are per-quantile min-folds over the
    * bounded frame. */
  def qqTable(a: DataFrame, b: DataFrame, valueCol: Column,
      quantiles: Int = 10): DataFrame = {
    require(quantiles >= 2, s"quantiles must be >= 2: $quantiles")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def cuts(df: DataFrame, out: String): DataFrame = {
      val hist = df.select(valueCol.cast("double").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
      val tot = hist.agg(sum(col("__c")).as("__n"))
      val spine = df.sparkSession.range(1, quantiles).toDF("quantile")
        .select(col("quantile").cast("int").as("quantile"))
      spine.crossJoin(broadcast(tot))
        .select(col("quantile"),
          ceil(col("__n").cast("double") * col("quantile").cast("double") /
            lit(quantiles.toDouble)).cast("long").as("__rk"))
        .join(cum, col("__cum") >= col("__rk"), "left")
        .groupBy(col("quantile"))
        .agg(min(col("__v")).as(out))
    }
    cuts(a, "value_a").join(cuts(b, "value_b"), Seq("quantile"),
        "full_outer")
      .select(col("quantile"), col("value_a"), col("value_b"),
        round(col("value_b") - col("value_a"), 6).as("gap"))
  }

  /** Market-concentration panel per group — Herfindahl–Hirschman index
    * (Σ share², ×10000 on the antitrust scale) plus the top-`topN`
    * concentration ratio. The "is this source mix dominated by a few
    * entities" read that complements the entropy/Gini family: HHI is
    * the square-weighted view (a 10 000 HHI is a monopoly), CR_n the
    * head-mass view.
    *
    * Exactness: `valueCol` quantizes to an unscaled BIGINT at `scale`
    * ([[graft.functions.Decimals]]); per-entity sums, Σs², and the
    * top-N sum all fold in DECIMAL(38,0) — only the two final ratios
    * divide in IEEE (rounded 6).
    *
    * Scale shape: one hash agg to the (group, entity) frame, one
    * per-group window for the top-N rank (rows already collapsed to
    * the entity DIMENSION), one per-group fold. The window carries the
    * full entity frame per group — at a 100 TB fact scale that frame
    * is still dimension-sized; a billion-entity group would swap the
    * rank for [[Relational.groupedRowNumber]]. */
  def concentration(df: DataFrame, groupCol: Column, entityCol: Column,
      valueCol: Column, topN: Int = 4, scale: Int = 2): DataFrame = {
    require(topN >= 1, "concentration topN must be >= 1")
    val dec38 = DecimalType(38, 0)
    val per = df
      .select(groupCol.as("group"), entityCol.as("__e"),
        graft.functions.Decimals.unscaledLong(valueCol, scale).as("__v"))
      .filter(col("group").isNotNull && col("__e").isNotNull &&
        col("__v").isNotNull)
      .groupBy(col("group"), col("__e"))
      .agg(sum(col("__v")).cast(dec38).as("__s"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("__s").desc, col("__e").asc)
    per.withColumn("__rn", row_number().over(w))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__s")).as("__t"),
        sum(col("__s") * col("__s")).as("__c2"),
        sum(when(col("__rn") <= topN, col("__s"))
          .otherwise(lit(0).cast(dec38))).as("__top"))
      .select(col("group"), col("n_entities"),
        round(col("__c2").cast("double") /
          (col("__t").cast("double") * col("__t").cast("double")) *
          lit(10000.0), 6).as("hhi"),
        round(col("__top").cast("double") / col("__t").cast("double"), 6)
          .as(s"cr$topN"))
  }

  /** Empirical-Bayes (James–Stein-style) shrinkage of per-group means
    * toward the grand mean, method-of-moments one-way random-effects
    * (Efron & Morris 1975's batting-average construction, the
    * multi-group generalization every ratings/CTR pipeline runs):
    * small groups are noisy, so each group mean is pulled toward the
    * grand mean by `B_g = τ̂²/(τ̂² + σ̂²/n_g)` — a 3-observation group
    * gets mostly prior, a 30k-observation group keeps its own mean.
    *
    * Estimators: `σ̂² = SSW/(N−k)` (pooled within-group),
    * `τ̂² = max(0, (SSB/(k−1) − σ̂²)/n₀)` with
    * `n₀ = (N − Σn_g²/N)/(k−1)` (the unbalanced-design effective
    * group size); `shrunk_g = x̄ + B_g·(x̄_g − x̄)`.
    *
    * Exactness: values quantize to unscaled LONGs at `scale`, so
    * `n_g, S_g, Q_g = Σv²` are exact DECIMAL(38,0); SSW/SSB involve
    * `S_g²/n_g` and so run IEEE, but each is the identical fixed op
    * sequence on exact integers in any engine, and the bounded-group
    * fold noise (~1e-15 relative) dies in round(,6).
    *
    * Returns per group `(group, n, mean, shrunk, shrink_b)`; shrunk /
    * shrink_b NULL when k < 2 or N = k (no within-group replication —
    * σ̂² undefined); when τ̂² = 0 the estimator collapses every group
    * to the grand mean (B = 0), which is the correct MoM answer, not a
    * degenerate case.
    *
    * Scale shape: ONE (group) hash aggregation — map-side combined —
    * then a 1-row totals fold cross-joined back as a broadcast panel
    * (the [[concentration]] pattern). Group cardinality is bounded by
    * contract (brands, sources, cohorts); rows never enter a window. */
  def ebShrinkMeans(df: DataFrame, groupCol: Column, valueCol: Column,
      scale: Int = 2): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val pow = lit(math.pow(10, scale))
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val g = df.select(groupCol.as("group"), q.cast(dec38).as("__v"))
      .filter(col("group").isNotNull && col("__v").isNotNull)
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"))
    val ngD = col("n").cast("double")
    // within-group SS contribution, IEEE on exact integers
    val sswG = col("__q").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / ngD
    val ssbG = col("__s").cast("double") * col("__s").cast("double") / ngD
    val totals = g.agg(
      sum(col("n")).as("__N"),
      count(lit(1)).as("__k"),
      sum(col("__s")).as("__S"),
      sum(sswG).as("__ssw"),
      sum(ssbG).as("__ssb2"),
      sum(col("n").cast("double") * col("n").cast("double")).as("__n2"))
    val nD = col("__N").cast("double")
    val kD = col("__k").cast("double")
    val grandU = col("__S").cast("double") / nD
    val ssb = col("__ssb2") - col("__S").cast("double") *
      col("__S").cast("double") / nD
    val s2w = col("__ssw") / (nD - kD)
    val n0 = (nD - col("__n2") / nD) / (kD - lit(1.0))
    val tau2 = greatest(lit(0.0), (ssb / (kD - lit(1.0)) - s2w) / n0)
    val panel = g.crossJoin(broadcast(totals.select(
      when(col("__k") >= 2 && col("__N") > col("__k"), grandU)
        .as("__grand"),
      when(col("__k") >= 2 && col("__N") > col("__k"), s2w).as("__s2w"),
      when(col("__k") >= 2 && col("__N") > col("__k"), tau2).as("__tau2"))))
    val meanU = col("__s").cast("double") / ngD
    // all-constant data: tau2 = s2w = 0 -> B = 0 (grand mean), not 0/0
    val b = when(col("__tau2") + col("__s2w") / ngD > 0.0,
      col("__tau2") / (col("__tau2") + col("__s2w") / ngD))
      .otherwise(when(col("__tau2").isNotNull, lit(0.0)))
    panel.select(col("group"), col("n"),
      round(meanU / pow, 6).as("mean"),
      round((col("__grand") + b * (meanU - col("__grand"))) / pow, 6)
        .as("shrunk"),
      round(b, 6).as("shrink_b"))
  }
}

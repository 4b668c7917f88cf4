package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization (north-star scope): turning an irregular
  * event stream into the dense, fixed-cadence grid that downstream
  * feature pipelines and dashboards expect.
  *
  * Both operators share the RUN construction: events collapse to one row
  * per (key, observed bucket), `lead()` attaches the NEXT observed bucket
  * (and, for interpolation, its sum), and `explode(sequence(bucket,
  * next − step))` emits each observation's run of grid rows up to — but
  * excluding — the next observation. Every gap row is generated next to
  * the exact two observations it needs, so gap-filling needs NO dense
  * grid join and NO second window pass (the earlier grid-join form paid
  * 3 shuffles + a join + a full-grid LOCF window; this form is 2
  * shuffles and a pre-explode window over the collapsed frame, measured
  * 2.1 s → ~0.6 s at sf0.1).
  *
  * Scale shape: one hash aggregation over the events (map-side partials),
  * one per-key window over |observed buckets| rows (not grid rows), and
  * a narrow explode whose fan-out is span/cadence. The window partitions
  * by key — parallelism is |keys|, the natural unit (millions of
  * users/devices at 100 TB); a single global series should use
  * [[Relational.groupedRowNumber]]'s range-partition construction.
  */
object TimeSeries {

  /** Per-(key, observed-bucket) aggregates with the next observed bucket
    * and sum attached (`__next` / `__nexts` null on each key's last
    * observation). Shared by [[gapFill]] and [[interpolate]]. */
  private def observedRuns(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val bucket = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / bucketSeconds) * bucketSeconds)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ob"))
    events
      // `__sum` is the exact micro-unit LONG (the Decimals fast-path
      // quantization ≡ cast to DECIMAL(18,6)·10⁶ but without the per-row
      // Double.toString decimal cast, and the SUM is the codegen'd long
      // adder instead of a BigDecimal buffer). Interpolation consumes the
      // micro units directly; gapFill divides once, exactly, at the end.
      .select(col(keyCol), bucket.as("__ob"),
        graft.functions.Decimals.unscaledLong(col(valueCol), 6).as("__v"))
      .groupBy(col(keyCol), col("__ob"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sum"))
      .withColumn("__next", lead(col("__ob"), 1).over(w))
      .withColumn("__nexts", lead(col("__sum"), 1).over(w))
  }

  /** The exploded grid of a runs frame: one row per grid bucket, carrying
    * its owning observation's columns (`bucket === __ob` on observed
    * rows). The run ends one step short of the next observation, so grid
    * buckets are emitted exactly once. */
  private def runGrid(runs: DataFrame, keyCol: String,
      bucketSeconds: Long): DataFrame = {
    val step = expr(s"INTERVAL $bucketSeconds SECONDS")
    runs.select(col(keyCol), col("__ob"), col("__n"), col("__sum"),
      col("__next"), col("__nexts"),
      explode(sequence(col("__ob"),
        coalesce(col("__next") - step, col("__ob")), step)).as("bucket"))
  }

  /** Resample an event stream onto a dense per-key time grid and fill the
    * gaps: every `bucket` between a key's first and last event gets a row
    * — observed buckets carry their event count and value sum, empty
    * buckets carry a zero count and the last observed sum carried forward
    * (LOCF). In the run construction LOCF is free: every gap row is
    * emitted BY its preceding observation, whose sum is the carried
    * value.
    *
    * Value sums are accumulated as exact micro-unit LONGS (the
    * [[graft.functions.Decimals]] convention — quantization identical to
    * a DECIMAL(18,6) cast, one exact decimal division at the end) so the
    * per-bucket sum is order-independent and any SQL oracle reproduces
    * it bit-exactly; overflow envelope 2^63 micro-units per bucket. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    val observed = col("bucket") === col("__ob")
    runGrid(observedRuns(events, keyCol, tsCol, valueCol, bucketSeconds),
        keyCol, bucketSeconds)
      .select(col(keyCol), col("bucket"),
        when(observed, col("__n")).otherwise(lit(0L)).as("n_events"),
        when(observed,
          graft.functions.Decimals.fromUnscaled(col("__sum"), 6)).as("bucket_sum"),
        graft.functions.Decimals.fromUnscaled(col("__sum"), 6).as("filled_sum"))
  }

  /** [[gapFill]]'s linear-interpolation sibling: empty buckets get the
    * straight line between the previous and next OBSERVED bucket sums
    * (time-weighted by bucket position), not a flat carry-forward — the
    * right resampling for continuously-varying measurements (sensor
    * readings, prices) where LOCF introduces a staircase bias. Observed
    * buckets pass through exactly; every gap row sits inside a run, so
    * both neighbors ride along with it (no reverse window: Spark's
    * unbounded-FOLLOWING frame would re-aggregate the partition tail per
    * row, O(rows²) per key — measured 8.7 s vs 0.4 s on a 105k-row
    * grid).
    *
    * The interpolated value is computed ENTIRELY in integer micro-units:
    * `round((pv·(m−k) + nv·k) / m)` with half-up integer rounding, where
    * pv/nv are the neighbor sums ×10⁶ (exact: the sums are DECIMAL(18,6))
    * and k/m are offsets in BUCKET units. Float interpolation lands
    * exactly on `.5` decimal boundaries whenever neighbors are one gap
    * apart (midpoints of 6-decimal values have an exact 5 in the 7th
    * place), and engines disagree on rounding those doubles — integer
    * arithmetic makes every engine produce the same micro-unit count,
    * and /10⁶ at the end is exact in double. The floor-division form via
    * pmod keeps even negative interpolands consistent across engines.
    *
    * Both offsets are multiples of `bucketSeconds`, so the arithmetic
    * runs in bucket units, not seconds — that shrinks the products by
    * bucketSeconds× and keeps everything in LONG (measured 3.6 s → 1.7 s
    * at sf0.1 vs the earlier DECIMAL(38) multiply/pmod/divide per grid
    * row). Overflow envelope: |sum|·10⁶ × 2·gap_buckets must stay below
    * 2^63 — e.g. per-bucket sums to ±4.6e9 with gaps to 10⁶ buckets
    * (114 years at hourly cadence). Outside it the ANSI-mode multiply
    * raises loudly (Spark 4 default) instead of corrupting. */
  def interpolate(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    val observed = col("bucket") === col("__ob")
    // __sum/__nexts are ALREADY micro-unit longs (observedRuns)
    val pv = col("__sum")
    val nv = col("__nexts")
    val k = ((unix_timestamp(col("bucket")) - unix_timestamp(col("__ob")))
      / lit(bucketSeconds)).cast("long")
    val m = ((unix_timestamp(col("__next")) - unix_timestamp(col("__ob")))
      / lit(bucketSeconds)).cast("long")
    // exact half-up integer rounding of num/m: floor((2·num + m) / (2m)),
    // floor-division spelled subtract-pmod-then-`div` so the quotient
    // divides exactly (the skewAudit idiom); `div` (not `/`) keeps the
    // division integral — Column./ on longs is DOUBLE division and loses
    // exactness past 2^53.
    val num = pv * (m - k) + nv * k
    runGrid(observedRuns(events, keyCol, tsCol, valueCol, bucketSeconds),
        keyCol, bucketSeconds)
      .withColumn("__a", when(observed, lit(null)).otherwise(num * 2 + m))
      .withColumn("__b", m * 2)
      .withColumn("__t", col("__a") - pmod(col("__a"), col("__b")))
      .withColumn("__i", expr("__t div __b"))
      .select(col(keyCol), col("bucket"),
        when(observed, col("__n")).otherwise(lit(0L)).as("n_events"),
        when(observed,
          graft.functions.Decimals.fromUnscaled(col("__sum"), 6)).as("bucket_sum"),
        (when(observed, pv).otherwise(col("__i")).cast("double") / 1000000.0)
          .as("interp_sum"))
  }

  /** Per-key event-rate anomalies: hourly (or any `bucketSeconds`
    * cadence) event counts z-scored against the key's own rate history
    * over its zero-FILLED grid — the monitoring panel for ingest streams
    * (a crawler that stalls shows z ≪ 0 hours; a retry storm z ≫ 0).
    * Buckets with no events MUST enter the statistics as zeros (that is
    * what "the crawler stalled" looks like), so the grid is densified
    * per key from its min to max observed bucket before the moments.
    *
    * Determinism: bucket counts are integers, so Σx and Σx² are EXACT
    * longs in any engine; mean and population variance are then single
    * double expressions over exact integers — both engines compute
    * bit-identical z-scores, and the `|z| ≥ zCut` boundary cannot
    * disagree (rounding to 6 decimals only on output). Keys with zero
    * variance have no anomalies by definition.
    *
    * Scale shape: one hash aggregation (events → per-bucket counts),
    * one per-key min/max aggregation + sequence-explode for the grid
    * (fan-out = span/cadence, the [[gapFill]] economics), a broadcast
    * join of the |keys|-row moment table, and a final filter — no
    * window over grid rows, no driver loops. Overflow: the Σx² LONG
    * accumulator bounds per-bucket counts at ~3e9 (x² per row must fit
    * 2^63; ANSI raises loudly beyond); the n·Σx² − (Σx)² moment
    * products run in exact DECIMAL(38), so no envelope there. */
  def rateAnomaly(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long, zCut: Double): DataFrame = {
    // One shared densification ([[filledCounts]]) across the monitoring
    // family; this operator's public contract keeps the TIMESTAMP bucket,
    // reconstructed losslessly from the epoch-long grid key.
    val filled = filledCounts(events, keyCol, tsCol, bucketSeconds)
      .select(col(keyCol), timestamp_seconds(col("bucket_epoch")).as("bucket"),
        col("__x"))
    val stats = filled.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val mean = col("__sx").cast("double") / col("__n").cast("double")
    // n·Σx² and (Σx)² run in DECIMAL(38): in LONG they overflow at
    // ~1e6 events/bucket × 1e4 buckets — well inside real traffic —
    // and (under ANSI) would abort the busiest keys. The exact decimal
    // numerator is cast to double only at the end, matching the
    // oracle's HUGEINT → DOUBLE path bit-for-bit.
    val dec = DecimalType(38, 0)
    val variance = (col("__n").cast(dec) * col("__sxx") -
        col("__sx").cast(dec) * col("__sx")).cast("double") /
      (col("__n") * col("__n")).cast("double")
    filled.join(broadcast(stats), keyCol)
      .filter(variance > 0.0)
      .withColumn("__z", (col("__x").cast("double") - mean) / sqrt(variance))
      .filter(abs(col("__z")) >= zCut)
      .select(col(keyCol), col("bucket"), col("__x").as("n_events"),
        round(col("__z"), 6).as("z"))
  }

  /** Zero-FILLED per-key bucket counts on an epoch-second grid — the
    * shared substrate of the monitoring family ([[rateAnomaly]],
    * [[cusumChangePoints]], [[rateAutocorr]]):
    * (key, bucket_epoch, x) for every `bucketSeconds` step between the
    * key's first and last event, absent buckets counted 0. Integer
    * epoch buckets, not timestamps, so engines compare numbers rather
    * than timezone renderings. One hash aggregation + a per-key
    * min/max + bounded sequence-explode (fan-out = span/cadence). */
  private def filledCounts(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val u = unix_timestamp(col(tsCol))
    val counts = events
      .groupBy(col(keyCol), (u - pmod(u, lit(bucketSeconds))).as("bucket_epoch"))
      .agg(count(lit(1)).as("__x"))
    val grid = counts.groupBy(col(keyCol))
      .agg(min(col("bucket_epoch")).as("__lo"), max(col("bucket_epoch")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(bucketSeconds)))
          .as("bucket_epoch"))
    grid.join(counts, Seq(keyCol, "bucket_epoch"), "left")
      .select(col(keyCol), col("bucket_epoch"),
        coalesce(col("__x"), lit(0L)).as("__x"))
  }

  /** One-sided CUSUM change-point detection over per-key event rates
    * (Page '54): flag the buckets where the cumulative exceedance of the
    * rate over an allowance `driftK` crosses `threshold` — the standard
    * "did the level shift up" monitor for ingest streams, where a z-score
    * panel ([[rateAnomaly]]) flags single spikes but misses a sustained
    * small shift.
    *
    * The textbook recursion `s_i = max(0, s_{i-1} + x_i − k)` is not a
    * window aggregate, but it has a closed form every SQL engine can run:
    * with `C_i = Σ_{j≤i}(x_j − k)`, `s_i = C_i − min(0, min_{j≤i} C_j)`
    * — a running sum and a running min over the same window. All
    * arithmetic is INTEGER (counts, integer drift, integer threshold),
    * so both engines produce identical s_i and the crossing set exactly
    * agrees.
    *
    * Scale shape: the [[filledCounts]] substrate plus ONE window pass
    * per key computing both running aggregates — Catalyst stacks them in
    * a single Window operator over one sort. */
  def cusumChangePoints(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long, driftK: Long, threshold: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filledCounts(events, keyCol, tsCol, bucketSeconds)
      .withColumn("__c", sum(col("__x") - driftK).over(w))
      .withColumn("__s", col("__c") - least(min(col("__c")).over(w), lit(0L)))
      .filter(col("__s") >= threshold)
      .select(col(keyCol), col("bucket_epoch"), col("__x").as("n_events"),
        col("__s").as("cusum"))
  }

  /** Lag-1 autocorrelation of the per-key bucket rate — the seasonality/
    * burst-persistence probe: r ≈ 1 means load level persists bucket to
    * bucket (capacity forecasting works), r ≈ 0 means memoryless arrivals,
    * r < 0 means alternation (often a retry/backoff artifact). Pearson r
    * over consecutive (x_i, x_{i+1}) pairs of the ZERO-FILLED grid
    * (absent buckets are real observations of zero, exactly as
    * [[rateAnomaly]] argues).
    *
    * Determinism: the five moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    * LONGS in any engine; the variance products n·Σx² − (Σx)² run in
    * DECIMAL(38) (in LONG they overflow for a busy key — the exact
    * rateAnomaly hazard) and r is one double expression, rounded at 6.
    * Keys with zero variance on either margin → null. Overflow envelope:
    * the per-row x·y product and the Σx² accumulator bound per-bucket
    * counts at ~3e9 (the rateAnomaly envelope); ANSI raises loudly
    * beyond.
    *
    * Scale shape: [[filledCounts]] + one lead() window + one hash
    * aggregation to |keys| rows. */
  def rateAutocorr(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_epoch"))
    val pairs = filledCounts(events, keyCol, tsCol, bucketSeconds)
      .withColumn("__y", lead(col("__x"), 1).over(w))
      .filter(col("__y").isNotNull)
    val d = (c: Column) => c.cast("double")
    // moment products in DECIMAL(38), not LONG: n·Σx² for a busy key
    // (1e6 events/bucket × 1e4 buckets) exceeds 2^63 and would abort
    // under ANSI — the exact overflow rateAnomaly handles the same way;
    // the oracle's HUGEINT path matches bit-for-bit after the one
    // double cast
    val dec = DecimalType(38, 0)
    pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .withColumn("__vx", col("n_pairs").cast(dec) * col("__sxx") -
        col("__sx").cast(dec) * col("__sx"))
      .withColumn("__vy", col("n_pairs").cast(dec) * col("__syy") -
        col("__sy").cast(dec) * col("__sy"))
      .select(col(keyCol), col("n_pairs"),
        // numerator stays in DOUBLE arithmetic — the oracle computes
        // CAST(..)::DOUBLE products, and the two engines must round the
        // same way; overflow is not a risk in double (only precision,
        // identical on both sides)
        when(col("__vx") > 0 && col("__vy") > 0, round(
          (d(col("n_pairs")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))) /
            sqrt(d(col("__vx")) * d(col("__vy"))), 6)).as("lag1_autocorr"))
  }

  /** Per-event trailing time-window aggregate — "sum/count of the last N
    * days as of each event", the rolling feature the ROWS-frame family
    * (q14) cannot express: the frame is defined by event TIME, not row
    * position, so sparse and bursty keys get correct windows.
    *
    * Implementation is a RANGE frame over floor-of-epoch LONG seconds —
    * engine-portable (SQL RANGE over an integer ORDER BY), deterministic
    * under intra-second ties (equal order keys share one frame, so no
    * tiebreak ambiguity can change a sum), and the windowed SUM runs on
    * exact quantized longs (the [[graft.functions.Decimals]] fast path)
    * with one exact division at the end.
    *
    * Scale shape: one hash shuffle on the key, one per-partition sort,
    * one Window operator computing both aggregates over the same frame —
    * Spark's sliding-frame sum ADDS and REMOVES rows incrementally as
    * the frame bounds advance (O(n) per partition, not O(n·frame)). */
  def rollingSum(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSeconds: Long, scale: Int = 2): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    val sec = unix_timestamp(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(sec)
      .rangeBetween(-windowSeconds, 0)
    events
      .withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("rolling_sum", graft.functions.Decimals.fromUnscaled(
        sum(graft.functions.Decimals.unscaledLong(col(valueCol), scale)).over(w),
        scale))
  }

  /** Day-of-week × hour-of-day seasonal profile — the load-shape /
    * activity-rhythm panel behind both capacity planning and the
    * "is this burst seasonal or anomalous?" triage that
    * [[rateAnomaly]]-style detectors need as a baseline. One row per
    * observed (dow, hour) bucket:
    * `(dow, hour, n, mean_value, mean_gap)` where `dow` is 0 = Sunday
    * (the portable convention — spelled explicitly on both engines
    * because their native dayofweek origins differ) and `mean_gap` is
    * the bucket mean minus the GLOBAL mean value.
    *
    * Exactness: values quantize to unscaled longs at `scale`
    * ([[graft.functions.Decimals]]); bucket and global sums are exact
    * integers; each mean is the one IEEE sequence
    * `(sum/10^scale)/n` and the gap subtracts the two. NULL timestamps
    * and NULL values are excluded.
    *
    * Scale shape: ONE map-side-combined hash aggregation to ≤ 168
    * buckets; the global mean rides a 1-row broadcast cross join. */
  def seasonalProfile(events: DataFrame, tsCol: Column, valueCol: Column,
      scale: Int = 6): DataFrame = {
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val pow = math.pow(10, scale)
    val base = events
      .filter(tsCol.isNotNull && valueCol.isNotNull)
      // Spark dayofweek is 1 = Sunday; normalize to 0 = Sunday
      .select((dayofweek(tsCol) - 1).as("dow"), hour(tsCol).as("hour"),
        q.as("__q"))
    def mean(s: Column, n: Column): Column =
      (s.cast("double") / lit(pow)) / n.cast("double")
    val buckets = base.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("__q")).as("__s"))
    val global = base.agg(count(lit(1)).as("__gn"), sum(col("__q")).as("__gs"))
    buckets.crossJoin(broadcast(global))
      .select(col("dow"), col("hour"), col("n"),
        round(mean(col("__s"), col("n")), 6).as("mean_value"),
        round(mean(col("__s"), col("n")) -
          mean(col("__gs"), col("__gn")), 6).as("mean_gap"))
  }

  /** Seasonally-contextualized bucket anomalies — the triage step on
    * top of [[seasonalProfile]]: which (dow, hour) buckets' mean value
    * deviates from the global mean by more than the pooled noise
    * explains? `z_b = (mean_b − ȳ) / √(σ²/n_b)` with σ² the POPULATION
    * variance from exact integer sums — the same envelope a per-bucket
    * control chart draws. Returns the top-`k` buckets by |z|
    * (tie-broken by (dow, hour)): `(dow, hour, n, mean_value, z)`;
    * z NULL when the corpus is constant (σ² = 0).
    *
    * Exactness: the [[graft.operators.Similarity.embeddingCovariance]]
    * convention — values quantize at `scale`, `n·Σq² − (Σq)²` is an
    * exact DECIMAL(38,0) integer, one IEEE chain to z.
    *
    * Scale shape: ONE hash aggregation to ≤ 168 buckets (carrying the
    * global sums via a 1-row broadcast), TakeOrderedAndProject for the
    * top-k. */
  def seasonalAnomalies(events: DataFrame, tsCol: Column, valueCol: Column,
      k: Int, scale: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = graft.functions.Decimals.unscaledLong(valueCol, scale)
    val pow = math.pow(10, scale)
    val base = events
      .filter(tsCol.isNotNull && valueCol.isNotNull)
      .select((dayofweek(tsCol) - 1).as("dow"), hour(tsCol).as("hour"),
        q.as("__q"))
    val buckets = base.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("__q")).cast(dec38).as("__s"))
    val global = base.agg(count(lit(1)).as("__gn"),
      sum(col("__q")).cast(dec38).as("__gs"),
      sum(col("__q").cast(dec38) * col("__q").cast(dec38)).as("__gsq"))
    val gn = col("__gn").cast("double")
    val gmean = (col("__gs").cast("double") / lit(pow)) / gn
    val gvar = (col("__gn").cast(dec38) * col("__gsq") -
      col("__gs") * col("__gs")).cast("double") /
      (gn * gn * lit(pow) * lit(pow))
    val bmean = (col("__s").cast("double") / lit(pow)) /
      col("n").cast("double")
    buckets.crossJoin(broadcast(global))
      .select(col("dow"), col("hour"), col("n"),
        round(bmean, 6).as("mean_value"),
        when(gvar > 0,
          round((bmean - gmean) /
            sqrt(gvar / col("n").cast("double")), 6)).as("z"))
      .orderBy(abs(col("z")).desc_nulls_last, col("dow").asc,
        col("hour").asc)
      .limit(k)
  }

  /** Kaplan–Meier survival curve over right-censored durations — the
    * retention/lifetime estimator that, unlike a raw survival fraction,
    * is unbiased under censoring (entities still alive at observation
    * end contribute risk-time without counting as deaths). The lifetime
    * read a product team runs on user/session/document longevity.
    *
    * Input: one row per entity with its observed `durationCol` (numeric,
    * e.g. days) and `eventCol` = 1 if the terminal event was OBSERVED,
    * 0 if the duration is censored. NULL durations are excluded.
    *
    * Returns one row per distinct duration:
    * `(duration, n_risk, n_event, n_censored, survival)` where
    * `survival = Π_{t ≤ d} (1 − e_t / r_t)` — computed as
    * `exp(Σ ln(1 − e/r))` so the running product is a cumulative
    * window SUM (associative; the ln/exp round-trip is the one
    * documented non-integer step, the [[Similarity]] NMI convention,
    * and a 0 factor propagates exactly: ln 0 = −∞, exp −∞ = 0).
    *
    * Scale shape: one hash aggregation collapses entities to the
    * distinct-duration frame (bounded — durations are day-grained by
    * construction); ONE cumulative window over that frame computes both
    * the at-risk walk and the log-survival sum; totals ride a 1-row
    * broadcast. Entity count never hits a window. */
  def kaplanMeier(df: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val g = df
      .select(durationCol.cast("double").as("duration"),
        eventCol.cast("long").as("__e"))
      .filter(col("duration").isNotNull)
      .groupBy(col("duration"))
      .agg(sum(col("__e")).as("n_event"),
        (count(lit(1)) - sum(col("__e"))).as("n_censored"),
        count(lit(1)).as("__c"))
    val w = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = g.agg(sum(col("__c")).as("__n"))
    g.crossJoin(broadcast(total))
      .withColumn("n_risk", col("__n") - sum(col("__c")).over(w) + col("__c"))
      // Spark's log() is NULL at 0 where the math wants ln 0 = −∞ (the
      // everyone-died step must zero the whole tail), so the e = r case
      // is spelled explicitly; the oracle mirrors with '-infinity'.
      .withColumn("__lnf",
        when(col("n_event") > 0 && col("n_event") < col("n_risk"),
          log(lit(1.0) - col("n_event").cast("double") /
            col("n_risk").cast("double")))
          .when(col("n_event") > 0, lit(Double.NegativeInfinity))
          .otherwise(lit(0.0)))
      .withColumn("survival", round(exp(sum(col("__lnf")).over(w)), 6))
      .select(col("duration"), col("n_risk"), col("n_event"),
        col("n_censored"), col("survival"))
  }

  /** Theil–Sen robust slope per key: the MEDIAN of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)`, x_i < x_j — the trend estimator that
    * shrugs off the outlier buckets that wreck a least-squares fit
    * (up to ~29% contamination). The per-entity usage-trend panel.
    *
    * Median convention: slopes sort ascending; odd count takes the
    * middle element, even count averages the two middles as
    * `(lo + hi)/2.0` — spelled out so the oracle runs the IDENTICAL
    * arithmetic rather than an engine-private interpolation. Keys with
    * a single point yield no pairs and drop out.
    *
    * Returns `(key, n_points, n_pairs, slope)` with slope rounded at 6.
    *
    * Scale shape: one hash aggregation to (key, x) points; a per-key
    * equi-join builds the O(p²) pair frame — p is the per-key POINT
    * count (bounded by the grid span, e.g. ≤366 daily buckets/year),
    * never the event count, and `maxPoints` fail-fasts the invariant
    * ([[Relational.intervalJoin]]'s guard idiom). The median rank walk
    * is a window partitioned by key over that bounded pair frame. */
  def theilSen(points: DataFrame, keyCol: String, xCol: Column, yCol: Column,
      maxPoints: Long = 4096L): DataFrame = {
    require(maxPoints > 0, "maxPoints must be positive")
    val p = points
      .select(col(keyCol).as("__k"), xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val counted = p.groupBy(col("__k")).agg(count(lit(1)).as("n_points"))
    val guarded = p.join(counted.where(OpsUtil.orRaise(
        col("n_points") <= maxPoints,
        lit("theilSen: key "), col("__k").cast("string"), lit(" has "),
        col("n_points"),
        lit(s" points (> maxPoints=$maxPoints); coarsen the x grid or " +
          "raise maxPoints"))), Seq("__k"))
    val a = guarded.select(col("__k"), col("n_points"), col("__x").as("__x1"),
      col("__y").as("__y1"))
    val b = guarded.select(col("__k"), col("__x").as("__x2"),
      col("__y").as("__y2"))
    val slopes = a.join(b, Seq("__k"))
      .filter(col("__x1") < col("__x2"))
      .select(col("__k"), col("n_points"),
        ((col("__y2") - col("__y1")) / (col("__x2") - col("__x1")))
          .as("__s"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(col("__s"))
    slopes
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col("__k"))))
      // integer-floor midrank picks: Spark's Column./ is TRUE division,
      // so spell the floor explicitly (n_pairs < 2^53 keeps it exact)
      .filter(col("__rn") === floor((col("n_pairs") + 1) / lit(2.0)) ||
        col("__rn") === floor((col("n_pairs") + 2) / lit(2.0)))
      // one surviving row (odd n_pairs) or two (even): sum/count IS the
      // "middle element or mean of the two middles" convention above
      .groupBy(col("__k"), col("n_points"), col("n_pairs"))
      .agg(round(sum(col("__s")) / count(lit(1)).cast("double"), 6)
        .as("slope"))
      .select(col("__k").as(keyCol), col("n_points"), col("n_pairs"),
        col("slope"))
  }

  /** Time-decayed per-key value sum — the recency-weighted feature every
    * behavioral model consumes ("activity score, half-life one week"):
    * each event contributes `value / 2^(age_buckets div halfLifeBuckets)`
    * where age is measured from a FIXED anchor (pass the batch watermark;
    * never now(), which would make the feature irreproducible).
    *
    * Determinism: the decay divisor is an integer power of two built by
    * LONG SHIFT (not `pow`, whose libm accuracy is engine-specific), so
    * the per-event scaling is an EXACT binary operation both engines
    * perform identically; the decayed values then quantize and sum under
    * the repo-wide [[graft.functions.Decimals]] convention. The exponent
    * clamps to [0, 60]: negative ages (events past the anchor) count
    * undecayed rather than exploding, and beyond 2^60 the contribution
    * is below any 6-decimal quantum anyway (and the shift would
    * overflow).
    *
    * Scale shape: a pure per-row projection into ONE hash aggregation
    * with map-side partials — the minimal plan; no window, no join. */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, anchor: String, halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds > 0, s"halfLifeSeconds must be positive: $halfLifeSeconds")
    // UTC-pinned parse: java.sql.Timestamp.valueOf would interpret the
    // anchor in the JVM DEFAULT timezone, which nothing in the repo pins
    // (only the Spark session TZ is set) — on a non-UTC host every age
    // would shift by the host offset and q121 would diverge from the
    // oracle's naive-UTC literal.
    // Lossless micros (NOT toEpochMilli * 1000, which truncates a
    // sub-millisecond anchor to milliseconds while the oracle's
    // epoch_us keeps full precision).
    val anchorInstant = java.time.LocalDateTime
      .parse(anchor.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val anchorMicros =
      anchorInstant.getEpochSecond * 1000000L + anchorInstant.getNano / 1000L
    val age = lit(anchorMicros) - graft.functions.Timestamps.tsMicros(col(tsCol))
    // exact floor division (the skewAudit idiom): subtract-pmod makes the
    // numerator exactly divisible, so the double quotient is exact
    val hl = lit(halfLifeSeconds * 1000000L)
    val exponent = greatest(least(
      ((age - pmod(age, hl)) / hl).cast("long"), lit(60L)), lit(0L))
    events
      .select(col(keyCol), col(valueCol).as("__val"), exponent.as("__e"))
      // SQL shiftleft accepts a column shift amount (the Scala functions.
      // shiftleft wrapper takes only a literal Int)
      .withColumn("__decayed", col("__val") /
        expr("cast(shiftleft(cast(1 as bigint), cast(__e as int)) as double)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Decimals.dsum(col("__decayed"), 6).as("decayed_sum"))
  }

  /** Trailing rolling MEDIAN over an already-regular series — the
    * robust smoother the rolling-mean family ([[rollingStats]]) can't
    * provide: one outlier day saturates a mean window but leaves the
    * median untouched. Input must be one row per (key, bucket) (the
    * shape [[gapFill]] emits); the window is the trailing `window` rows
    * INCLUDING the current one, partial at the series head like SQL's
    * `ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`.
    *
    * Exactness: both engines sort the same ≤`window`-element array and
    * average the two middle values — halves are exact in IEEE, so no
    * rounding is needed.
    *
    * Scale shape: one hash shuffle on `keyCol`, one per-partition sort,
    * one Window operator whose per-row state is the bounded
    * `window`-element buffer — O(window) memory per key, no quadratic
    * term, no driver materialization. Spark has no native window-median;
    * the bounded collect_list + sort_array IS the right shape because
    * the frame is rows-bounded (an unbounded frame would need a
    * treap/quantile-sketch custom aggregate instead). */
  def rollingMedian(series: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, window: Int): DataFrame = {
    require(window >= 1, "rollingMedian window must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    val arr = sort_array(collect_list(col(valueCol).cast("double")).over(w))
    val sz = size(arr)
    val lo = element_at(arr, floor((sz + lit(1)) / lit(2)).cast("int"))
    val hi = element_at(arr, floor(sz / lit(2)).cast("int") + lit(1))
    series.withColumn("rolling_median", (lo + hi) / lit(2.0))
  }

  /** Lagged cross-correlation between two bucketed series — the
    * lead/lag read ("do clicks PRECEDE purchases, and by how many
    * days?") that a single same-bucket correlation cannot give. For
    * each lag ℓ in [−maxLag, maxLag], Pearson correlation of
    * `(x_t, y_{t+ℓ})` over the overlapping buckets; the argmax lag is
    * the estimated lead time.
    *
    * Inputs are one row per bucket `(bucketCol: LONG ordinal, valueCol)`
    * — the [[gapFill]]-style regular-series contract; integer bucket
    * arithmetic keeps the shifted join an equi-join. Values quantize to
    * unscaled longs at `scale` so all five moment sums fold exactly in
    * DECIMAL(38,0); the Pearson ratio is the one IEEE step (the
    * [[graft.operators.Evaluation]] spearman convention) and the scale
    * factor cancels exactly in the ratio.
    *
    * Scale shape: the small lag fan-out (×(2·maxLag+1)) rides the
    * second series; one equi-join on the shifted bucket; one hash agg
    * to the (2·maxLag+1)-row moment frame. No window, no driver
    * materialization. */
  def crossCorrelation(a: DataFrame, b: DataFrame, bucketCol: String,
      valueCol: String, maxLag: Int, scale: Int = 0): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val dec38 = DecimalType(38, 0)
    def q(c: Column) =
      graft.functions.Decimals.unscaledLong(c.cast("double"), scale)
    val x = a.select(col(bucketCol).cast("long").as("__t"),
      q(col(valueCol)).cast(dec38).as("__x"))
    val lags = (-maxLag to maxLag).map(l => lit(l.toLong))
    val y = b.select(col(bucketCol).cast("long").as("__tb"),
        q(col(valueCol)).cast(dec38).as("__y"))
      .withColumn("__lag", explode(array(lags: _*)))
      // pair (x_t, y_{t+lag}): y at bucket tb joins x at t = tb - lag
      .withColumn("__t", col("__tb") - col("__lag"))
    val m = x.join(y, Seq("__t"))
      .groupBy(col("__lag").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val nD = col("n").cast(dec38)
    val vx = nD * col("__sxx") - col("__sx") * col("__sx")
    val vy = nD * col("__syy") - col("__sy") * col("__sy")
    val cov = nD * col("__sxy") - col("__sx") * col("__sy")
    m.select(col("lag"), col("n"),
      when(vx > 0 && vy > 0,
        round(cov.cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 6)).as("corr"))
  }

  /** Order-3 permutation entropy per key (Bandt & Pompe 2002): the
    * complexity read of a series from its ordinal TRIPLE patterns alone
    * — a flat-or-trending series uses 1–2 of the 6 patterns (entropy
    * → 0), white noise uses all 6 uniformly (entropy → log₂6). Value
    * magnitudes never enter, so the statistic is robust to scale/drift
    * where autocorrelation is not.
    *
    * Ties take the STABLE ordinal convention (earlier position ranks
    * first: position i precedes j iff v_i < v_j ∨ (v_i = v_j ∧ i < j)),
    * so the pattern of every triple is deterministic and the 6-way CASE
    * below is reproducible in any engine. `idCol` breaks timestamp ties
    * in the sequence order itself.
    *
    * Returns per key `(key, n_triples, n_patterns, perm_entropy,
    * normalized)` with entropy in bits and `normalized = H/log₂6`.
    *
    * Scale shape: one hash shuffle on the key, one per-partition sort,
    * a single Window operator carrying two bounded lead() buffers, then
    * a hash agg to the ≤6-patterns-per-key frame — per-key state is
    * O(1), no driver materialization. */
  def permutationEntropy(events: DataFrame, key: String, ts: String,
      idCol: String, valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col(ts).asc, col(idCol).asc)
    val v1 = col("__v1"); val v2 = col("__v2"); val v3 = col("__v3")
    // stable order: i before j iff v_i < v_j or (equal and i < j)
    val p12 = v1 <= v2          // 1 before 2 (tie keeps position order)
    val p13 = v1 <= v3
    val p23 = v2 <= v3
    val pattern = when(p12 && p23, "123")
      .when(p12 && !p23 && p13, "132")
      .when(p12 && !p23 && !p13, "312")
      .when(!p12 && p13, "213")
      .when(!p12 && !p13 && p23, "231")
      .otherwise("321")
    val triples = events
      .select(col(key).as("__k"), col(ts), col(idCol),
        valueCol.cast("double").as("__v1"))
      .filter(col("__v1").isNotNull)
      .withColumn("__v2", lead(col("__v1"), 1).over(w))
      .withColumn("__v3", lead(col("__v1"), 2).over(w))
      .filter(col("__v2").isNotNull && col("__v3").isNotNull)
      .select(col("__k"), pattern.as("__p"))
      .groupBy(col("__k"), col("__p"))
      .agg(count(lit(1)).as("__c"))
    val totals = triples.groupBy(col("__k"))
      .agg(sum(col("__c")).as("n_triples"), count(lit(1)).as("n_patterns"))
    val p = col("__c").cast("double") / col("n_triples").cast("double")
    triples.join(totals, Seq("__k"))
      .groupBy(col("__k").as("key"), col("n_triples"), col("n_patterns"))
      .agg(round(sum(-p * log(p)) / lit(math.log(2.0)), 6)
        .as("perm_entropy"))
      .withColumn("normalized",
        round(col("perm_entropy") / lit(math.log(6.0) / math.log(2.0)), 6))
  }

  /** Per-group OLS trend with a Durbin–Watson residual-autocorrelation
    * audit — the "is this metric really trending, and can I trust the
    * fit" panel: slope/intercept/R² give the linear trend, and DW =
    * Σ(eₜ−eₜ₋₁)²/Σeₜ² reads whether the residuals are serially
    * correlated (DW ≈ 2 independent, → 0 positively autocorrelated —
    * the classic sign that a linear fit under-models a drifting
    * series and its confidence intervals are fiction).
    *
    * Input contract matches [[crossCorrelation]]: `df` is an already
    * BUCKETED frame (one row per (group, x)), x and y integral LONGs.
    * The closed forms run on exact DECIMAL(38,0) moment sums `n, Σx,
    * Σy, Σx², Σxy, Σy²`; slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and the
    * residuals eₜ = yₜ − (a + b·xₜ) are the only IEEE steps, each a
    * fixed op sequence on exact integers so any engine reproduces them
    * bit-for-bit; the final DW fold carries ~1e-15 relative noise that
    * round(,6) absorbs.
    *
    * Returns per group `(group, n, slope, intercept, r2, dw)`; slope /
    * intercept NULL when var(x) = 0 (single bucket or constant x), r2
    * NULL when either variance is 0, dw NULL when n < 2 or the fit is
    * exact (Σe² = 0).
    *
    * Scale shape: one hash agg collapses the bucketed frame to
    * per-group moments; the residual pass joins those BOUNDED group
    * stats back (broadcast-sized by construction) and runs ONE lag
    * window over the bucketed frame — rows never enter a window, and
    * nothing beyond the bucket frame shuffles twice. */
  def olsTrend(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val base = df.select(col(groupCol).as("__g"),
        col(xCol).cast("long").as("__xl"),
        col(yCol).cast("long").as("__yl"))
      .filter(col("__xl").isNotNull && col("__yl").isNotNull)
    val x = col("__xl").cast(dec38)
    val y = col("__yl").cast(dec38)
    val m = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
        sum(y * y).as("__syy"))
    val nD = col("n").cast(dec38)
    val varxN = nD * col("__sxx") - col("__sx") * col("__sx")
    val varyN = nD * col("__syy") - col("__sy") * col("__sy")
    val covN = nD * col("__sxy") - col("__sx") * col("__sy")
    val slope = when(varxN > 0,
      covN.cast("double") / varxN.cast("double"))
    val icept = (col("__sy").cast("double") -
      slope * col("__sx").cast("double")) / col("n").cast("double")
    val stats = m.select(col("__g"), col("n"),
      slope.as("__b"), icept.as("__a"),
      when(varxN > 0 && varyN > 0,
        covN.cast("double") * covN.cast("double") /
          (varxN.cast("double") * varyN.cast("double"))).as("__r2"))
    val e = col("__yl").cast("double") -
      (col("__a") + col("__b") * col("__xl").cast("double"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__xl"))
    val resid = base.join(stats, Seq("__g"))
      .withColumn("__e", e)
      .withColumn("__ep", lag(col("__e"), 1).over(w))
    val dw = resid.groupBy(col("__g"))
      .agg(sum(col("__e") * col("__e")).as("__den"),
        sum(when(col("__ep").isNotNull,
          (col("__e") - col("__ep")) * (col("__e") - col("__ep"))))
          .as("__num"))
    stats.join(dw, Seq("__g"))
      .select(col("__g").as("group"), col("n"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        when(col("n") >= 2 && col("__den") > 0.0,
          round(col("__num") / col("__den"), 6)).as("dw"))
  }

  /** Wald–Wolfowitz runs test on a bucketed series — is the sequence of
    * above/below-median excursions RANDOM, or does the metric wander in
    * long runs (regime persistence) / flip-flop faster than chance
    * (overcorrection)? The distribution-free cousin of [[olsTrend]]'s
    * Durbin–Watson: DW needs a fitted model, the runs test needs only a
    * median.
    *
    * Convention: values EQUAL to the median are dropped (the standard
    * two-category reduction), signs are above(1)/below(0), and a run is
    * a maximal same-sign stretch in `orderCol` order. Under H₀ the run
    * count is `μ = 2n₁n₀/(n₁+n₀) + 1` with
    * `σ² = (μ−1)(μ−2)/(n₁+n₀−1)`; z = (R−μ)/σ.
    *
    * Exactness: the median of the integral `valueCol` is
    * `percentile(v, 0.5)` — linear interpolation at the (n−1)/2 index,
    * exact halves on LONG inputs, the same convention DuckDB's
    * quantile_cont uses; run/side counts are exact integers, and only
    * μ/σ/z run IEEE (fixed op sequence, round(,6) output).
    *
    * Returns one row `(n_above, n_below, runs, mu_runs, z)`; z NULL
    * when either side is empty (one run by construction, σ = 0).
    *
    * Scale shape: the input is an already-BUCKETED frame (the
    * [[crossCorrelation]] contract), so the single-partition
    * median+lag windows run over a bounded series, never over raw
    * rows; the sign sequence folds to one row. */
  def runsTest(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val med = df.agg(
      expr(s"percentile($valueCol, 0.5)").as("__med"))
    val signed = df.select(col(orderCol).as("__o"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .crossJoin(broadcast(med))
      .filter(col("__v") =!= col("__med"))
      .select(col("__o"), (col("__v") > col("__med")).cast("int").as("__s"))
    val w = Window.orderBy(col("__o"))
    val runs = signed
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .agg(
        sum(col("__s")).as("n_above"),
        sum(lit(1) - col("__s")).as("n_below"),
        (sum(when(col("__prev").isNull ||
          col("__prev") =!= col("__s"), 1L).otherwise(0L))).as("runs"))
    val n1 = col("n_above").cast("double")
    val n0 = col("n_below").cast("double")
    val mu = lit(2.0) * n1 * n0 / (n1 + n0) + lit(1.0)
    val sigma2 = (mu - lit(1.0)) * (mu - lit(2.0)) / (n1 + n0 - lit(1.0))
    val ok = col("n_above") > 0 && col("n_below") > 0
    runs.select(col("n_above"), col("n_below"), col("runs"),
      when(ok, round(mu, 6)).as("mu_runs"),
      when(ok && sigma2 > 0.0,
        round((col("runs").cast("double") - mu) / sqrt(sigma2), 6)).as("z"))
  }

  /** Mann–Kendall trend test on a bucketed series — is there a
    * MONOTONIC trend, judged purely on pairwise orderings? The
    * nonparametric companion to [[olsTrend]] (no linearity assumption)
    * and the significance test [[graft.operators
    * .Evaluation]]-style pipelines pair with the Theil–Sen slope: S
    * counts concordant-minus-discordant pairs, and the tie-corrected
    * normal approximation `Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18`
    * with the ±1 continuity correction gives z.
    *
    * Exactness: S is an exact integer sum of pairwise signs; n and the
    * tie histogram are exact; only Var(S) and z run IEEE (fixed op
    * sequence). Returns one row `(n, n_pairs, s, z)`; z NULL when
    * n < 2 or Var(S) ≤ 0 (all values tied).
    *
    * Scale shape: the pairwise comparison is a self-join on the
    * already-BUCKETED frame (the [[crossCorrelation]] contract — e.g.
    * 365 daily points = 66k comparisons, constant in row count); the
    * tie histogram is a hash agg of the same bounded frame, and the
    * three 1-row panels combine by broadcast. Raw rows never enter
    * the quadratic step — and unlike the documented-only contracts
    * elsewhere, `maxPoints` ENFORCES it (isotonicFit's maxBins
    * discipline): a caller passing raw rows fails fast instead of
    * getting a silent n² plan.
    *
    * Behavior change (round 11→12): the guard was introduced in round
    * 11 with a 10k default, which could reject previously-valid
    * bucketed callers (e.g. a decade of hourly buckets = 87.6k
    * points). The default is now 100000 — far above any plausible
    * bucketed series (100k points = 5·10⁹ comparisons, still tractable
    * as a bounded self-join) while still fail-fasting the raw-row
    * misuse the guard targets; callers that bucketed coarser lose
    * nothing. */
  def mannKendall(df: DataFrame, orderCol: String,
      valueCol: String, maxPoints: Long = 100000L): DataFrame = {
    require(maxPoints > 0, "maxPoints must be positive")
    val raw = df.select(col(orderCol).as("__o"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__o").isNotNull && col("__v").isNotNull)
    val base = raw
      .crossJoin(broadcast(raw.agg(count(lit(1)).as("__k"))))
      .where(OpsUtil.orRaise(col("__k") <= maxPoints,
        lit("mannKendall: "), col("__k"),
        lit(s" points (> maxPoints=$maxPoints); bucket the series " +
          "first or raise maxPoints")))
      .select(col("__o"), col("__v"))
    val a = base.select(col("__o").as("__oa"), col("__v").as("__va"))
    val b = base.select(col("__o").as("__ob"), col("__v").as("__vb"))
    val pairs = a.join(b, col("__oa") < col("__ob"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(signum(
          (col("__vb") - col("__va")).cast("double")).cast("long")),
          lit(0L)).as("s"))
    val counts = base.agg(count(lit(1)).as("n"))
    val t = col("count").cast("double")
    val ties = base.groupBy(col("__v")).agg(count(lit(1)).as("count"))
      .agg(coalesce(sum(t * (t - lit(1.0)) * (lit(2.0) * t + lit(5.0))),
        lit(0.0)).as("__tsum"))
    val nD = col("n").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("__tsum")) / lit(18.0)
    val sD = col("s").cast("double")
    val z = when(col("s") > 0, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s") < 0, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    counts.crossJoin(broadcast(pairs)).crossJoin(broadcast(ties))
      .select(col("n"), col("n_pairs"), col("s"),
        when(col("n") >= 2 && varS > 0.0, round(z, 6)).as("z"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables.load
import graft.pipeline.{TradeInPipeline, TradeInSchema}

/** Correctness queries for the trade-in pipeline (SURVEY.md §2.2 P2/P3,
  * §2.6 M1/M3, §2.7 F1–F5/F10): a deterministic 44-column staging fixture
  * is derived from `orders`, then the pipeline's stage / typed-projection /
  * two-run-merge transforms run over it, each with a DuckDB oracle.
  *
  * The fixture's raw column expressions are written once as SQL text in
  * the dialect intersection of Spark SQL and DuckDB (`rawSpec`), so the
  * Spark query and the oracle construct bit-identical inputs; only the
  * timestamp-string rendering differs per engine (`date_format` vs
  * `strftime`) and is defined twice, side by side.
  *
  * Timestamp strings are emitted in 5 rotating shapes keyed on
  * `o_orderkey % 5` — ISO-T with 6-digit fraction + Z, ISO-T no fraction
  * + Z, space-separated with 3-digit fraction (exercises the pad-to-6
  * path of F1), space-separated plain, and garbage (exercises the
  * parse-failure → now fallback, F4). The reference accepts exactly these
  * shapes (rqtradein_etl.py:249-284).
  */
object TradeInQueries {

  /** Temp dirs created by disk-path queries (q129), all deleted by ONE
    * JVM shutdown hook. A hook registered per invocation accumulates a
    * thread per run over a long session (round-8 advice finding); the
    * dirs themselves must live until process exit because the returned
    * DataFrame reads them lazily — the caller's action runs after the
    * query function has returned. */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val tempDirHookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempDirs.forEach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit)))
    true
  }
  private def registerTempDir(p: java.nio.file.Path): Unit = {
    require(tempDirHookInstalled)
    tempDirs.add(p): Unit
  }

  // ------------------------------------------------------------- fixture

  /** Fixed "now" per logical run — replayable F4 fallback + audit stamps. */
  private[graft] val Now1 = "2024-06-01 10:00:00"
  private[graft] val Now2 = "2024-06-02 10:00:00"

  /** Event-time base: orders dates jittered to non-trivial
    * seconds/microseconds so fraction truncation is exercised for real.
    * One text per engine (interval syntax differs). */
  private val tsSpark =
    "timestampadd(MICROSECOND, (o_orderkey*7919)%1000000, timestampadd(SECOND, o_orderkey%86399, o_orderdate))"
  private val tsDuck =
    "o_orderdate + to_seconds(o_orderkey%86399) + to_microseconds((o_orderkey*7919)%1000000)"

  /** KEEP IN SYNC: shared-dialect SQL for the 38 non-timestamp raw
    * columns, evaluated verbatim by both engines over
    * (k, c, p, st, pri) = (o_orderkey, o_custkey, o_totalprice,
    * o_orderstatus, o_orderpriority).
    *
    * Money strings are built from exact integer cents (`floor(p * f)` —
    * IEEE-identical in both engines) rather than a double→DECIMAL cast:
    * Spark rounds that cast through the double's shortest decimal
    * representation while DuckDB rounds the binary value, so halfway
    * cases diverge. `f` is the money factor scaled to cents (e.g. 110.0
    * for a 1.1× amount). */
  private[graft] def dec2(f: String, v: String = "p") =
    s"(CAST(floor(floor($v * $f) / 100.0) AS BIGINT) || '.' || " +
      s"lpad(CAST(CAST(floor($v * $f) AS BIGINT) % 100 AS STRING), 2, '0'))"
  private val rawSpec: Seq[(String, String)] = Seq(
    "SaleInvoiceID"          -> "CAST(k AS STRING)",
    "TradeInTransactionID"   -> "CAST(k + 1000000 AS STRING)",
    "InvoiceIDByStore"       -> "'INV-' || k",
    "InvoiceID"              -> "CAST(k AS STRING)",
    "TradeInStatus"          -> "st",
    "ItemID"                 -> "CAST(c AS STRING)",
    "ManufacturerModel"      -> "pri",
    "SerialNumber"           -> "'SN' || k",
    "StoreName"              -> "'Store-' || (c % 50)",
    "RegionName"             -> "'Region-' || (c % 5)",
    "PhoneRebateAmount"      -> dec2("10.0"),
    "PromotionValue"         -> dec2("5.0"),
    "PreDeviceValueAmount"   -> dec2("50.0"),
    "PrePromotionValueAmount" -> dec2("45.0"),
    "TrackingNumber"         -> "'TRK' || ((k * 7) % 1000000)",
    "OriginalTradeInvoiceID" -> "CASE WHEN k % 4 = 0 THEN CAST(k - 1 AS STRING) END",
    "OrderNumber"            -> "'ORD-' || k",
    "CreditApplicationNum"   -> "CASE WHEN k % 7 = 0 THEN 'CA' || k ELSE '' END",
    "LocationCode"           -> "'L' || (c % 100)",
    "MasterOrderNumber"      -> "'M' || (k % 1000)",
    "SequenceNumber"         -> "CAST(k % 100 AS STRING)",
    "PromoValue"             -> dec2("2.0"),
    "OrganicPrice"           -> dec2("80.0"),
    "ComputedPrice"          -> dec2("85.0"),
    "TradeInMobileNumber"    -> "'555' || lpad(CAST(k % 10000000 AS STRING), 7, '0')",
    "SubmissionId"           -> "'SUB' || k",
    "TradeInEquipMake"       -> "CASE k % 4 WHEN 0 THEN 'Apple' WHEN 1 THEN 'Samsung' WHEN 2 THEN 'Google' ELSE 'Other' END",
    "TradeInEquipCarrier"    -> "CASE k % 3 WHEN 0 THEN 'VZW' WHEN 1 THEN 'ATT' ELSE 'TMO' END",
    "DeviceSku"              -> "'SKU' || (k % 500)",
    "TradeInDeviceId"        -> "'DEV' || k",
    "LobType"                -> "CASE k % 2 WHEN 0 THEN 'Consumer' ELSE 'Business' END",
    "OrderType"              -> "CASE k % 3 WHEN 0 THEN 'New' WHEN 1 THEN 'Upgrade' ELSE 'Return' END",
    "PurchaseDeviceId"       -> "'PD' || (k + 5000)",
    "TradeInAmount"          -> dec2("110.0"),
    "AmountUsed"             -> dec2("60.0"),
    "AmountPending"          -> dec2("30.0"),
    "PromoCompletion"        -> "CASE k % 2 WHEN 0 THEN 'Complete' ELSE 'Pending' END",
    "MobileNumber"           -> "'555' || lpad(CAST((k * 3) % 10000000 AS STRING), 7, '0')")

  /** Spark rendering of one raw timestamp string, shape keyed by `m`
    * (0..4). KEEP IN SYNC with [[fmtDuck]]. */
  private def fmtSpark(ts: Column, m: Column, k: Column): Column =
    when(m === 0, concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")))
      .when(m === 1, concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), lit("Z")))
      .when(m === 2, concat(date_format(ts, "yyyy-MM-dd HH:mm:ss."),
        substring(date_format(ts, "SSSSSS"), 1, 3)))
      .when(m === 3, date_format(ts, "yyyy-MM-dd HH:mm:ss"))
      .otherwise(concat(lit("garbage-"), k))

  /** What the multi-format parser recovers from shape `m` of base `ts` —
    * used by the oracles (which know each row's shape; the engine under
    * test must sniff it): full µs for shape 0, seconds for 1/3,
    * milliseconds for 2 (3-digit fraction padded to µs), `now` for
    * garbage. */
  private def parsedDuck(ts: String, m: String, now: String): String =
    s"CASE $m WHEN 0 THEN $ts WHEN 1 THEN date_trunc('second', $ts) " +
      s"WHEN 2 THEN date_trunc('ms', $ts) WHEN 3 THEN date_trunc('second', $ts) " +
      s"ELSE TIMESTAMP '$now' END"

  private def estStrDuck(x: String): String =
    s"strftime(($x AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York', '%Y-%m-%d %H:%M:%S')"
  private def estTsDuck(x: String): String =
    s"date_trunc('second', ($x AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')"

  /** DuckDB CTE producing the raw fixture (shared-dialect columns plus
    * the three per-shape timestamp strings). */
  private def fmtDuck(ts: String, m: String): String =
    s"""CASE $m
       | WHEN 0 THEN strftime($ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'
       | WHEN 1 THEN strftime($ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
       | WHEN 2 THEN strftime($ts, '%Y-%m-%d %H:%M:%S.') || substring(strftime($ts, '%f'), 1, 3)
       | WHEN 3 THEN strftime($ts, '%Y-%m-%d %H:%M:%S')
       | ELSE 'garbage-' || k END""".stripMargin

  private val baseCteDuck =
    s"""base AS (SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
       |  o_orderstatus AS st, o_orderpriority AS pri, $tsDuck AS ts FROM orders)""".stripMargin

  private val rawCteDuck =
    s"""$baseCteDuck,
       |raw AS (SELECT k, ts,
       |  ${rawSpec.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")},
       |  ${fmtDuck("ts", "k % 5")} AS TradeInDate,
       |  ${fmtDuck("ts", "(k + 1) % 5")} AS PostTime,
       |  ${fmtDuck("ts", "(k + 2) % 5")} AS ResponseTime
       |  FROM base)""".stripMargin

  /** The Spark-side raw fixture: identical values, built from the same
    * shared SQL text, plus helper columns `__k`/`__p`/`__ts` (dropped by
    * `stage`, used by q33's day-2 variants). */
  /** When `sorted`, the narrow base is globally ordered by `k` BEFORE the
    * wide fixture projection: a final `orderBy` on the 44-col result
    * would range-sample its child, re-executing the whole expensive
    * expression tree a second time (measured ~2× the query), while
    * sorting 6 narrow columns and projecting after preserves the same
    * total order (SaleInvoiceID = k, unique) for ~nothing. The explicit
    * partition count keeps AQE from coalescing the small sorted base into
    * one partition, which would serialize the wide projection above it. */
  /** The narrow 6-col base (k, c, p, st, pri, ts) — everything the wide
    * fixture is a pure function of. */
  private[graft] def narrowBase(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders").select(
      col("o_orderkey").as("k"), col("o_custkey").as("c"),
      col("o_totalprice").as("p"), col("o_orderstatus").as("st"),
      col("o_orderpriority").as("pri"), expr(tsSpark).as("ts"))

  /** The wide 47-col fixture projection over a (possibly filtered /
    * re-partitioned) narrow base. Per-row cost is ~100 µs of string
    * formatting, so callers should spread and filter the base FIRST. */
  private[graft] def widen(base: DataFrame): DataFrame = {
    val cols = rawSpec.map { case (n, e) => expr(e).as(n) } ++ Seq(
      fmtSpark(col("ts"), col("k") % 5, col("k")).as("TradeInDate"),
      fmtSpark(col("ts"), (col("k") + 1) % 5, col("k")).as("PostTime"),
      fmtSpark(col("ts"), (col("k") + 2) % 5, col("k")).as("ResponseTime"),
      col("k").as("__k"), col("p").as("__p"), col("ts").as("__ts"))
    base.select(cols: _*)
  }

  private[graft] def rawSpark(s: SparkSession, d: String,
      sorted: Boolean = false): DataFrame = {
    val base0 = narrowBase(s, d)
    // Either branch spreads the narrow 6-col base across the full
    // parallelism BEFORE the wide 47-col projection: the corpus parquet is
    // one row group = one scan partition, and serializing ~100 µs/row of
    // formatting work on one thread dominates the whole query (measured
    // 17 s vs 4 s at sf0.1).
    val base =
      if (sorted) base0
        .repartitionByRange(s.sparkContext.defaultParallelism, col("k"))
        .sortWithinPartitions("k")
      else base0.repartition(s.sparkContext.defaultParallelism, col("k"))
    widen(base)
  }

  private[graft] def nowLit(s: String): Column = lit(s).cast("timestamp")

  // ------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P2 + F1-F4/F10: the staging load — multi-format parse with now
    // fallback, EST derivation, audit stamp (rqtradein_etl.py:229-336).
    "q31_tradein_stage" -> ((s, d) => {
      TradeInPipeline.stage(rawSpark(s, d, sorted = true), nowLit(Now1))
        .select("SaleInvoiceID", "TradeInDate", "TradeInDateEST",
          "PostTime", "PostTimeEST", "ResponseTime", "ResponseTimeEST",
          "ETLRowInsertedEST")
    }),

    // P3: the full 44-column staging→target typed projection
    // (rqtradein_etl.py:98-145). Decimals emitted as canonical DOUBLE.
    "q32_tradein_typed" -> ((s, d) => {
      val typed = TradeInSchema.toTyped(
        TradeInPipeline.stage(rawSpark(s, d, sorted = true), nowLit(Now1)))
      val out = TradeInSchema.columns.map { c =>
        if (TradeInSchema.decimalCols(c)) col(c).cast("double").as(c) else col(c)
      }
      typed.select(out: _*)
    }),

    // M1+M3+T2: two overlapping daily runs — empty → day1 → day2 — with
    // audit stamps and the insert/update/keep split; day 2 carries
    // intra-batch duplicates resolved by the dedup window
    // (rqtradein_etl.py:150-185).
    "q33_tradein_merge_2run" -> ((s, d) => {
      // The fixture is consumed three times (day1, day2 base, day2 dups).
      // persist() materializes the NARROW 6-col base — round 2 persisted
      // the 47-col wide fixture instead, and the 47-strings-per-row
      // memory-store round trip dominated the query (4.75 s at sf0.1).
      // Here each consumer filters the cheap base first and pays the
      // wide formatting projection only for the rows it keeps
      // (0.67 + 0.5 + 0.1 of the corpus) — filter-below-projection,
      // exactly what Catalyst would plan had the fixture been a real
      // staging-table scan.
      val base = narrowBase(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("k"))
        .persist()
      val day1 = widen(base.filter(col("k") % 3 =!= 0))
      // k % 10 = 0 ⊆ k % 2 = 0: each dup row re-derives from a narrow row
      // day 2 already keeps, with a bumped amount and a +1-day shape-0
      // TradeInDate that out-sorts the base row in the intra-batch dedup
      // window. Generating dups by exploding a per-row variant array pays
      // the wide formatting projection ONCE over the k%2 slice instead of
      // widening the k%10 slice a second time and unioning (round 3's
      // shape — one more 10%-of-corpus widen plus a union branch).
      val day2 = widen(base.filter(col("k") % 2 === 0))
        .withColumn("__dup", explode(
          when(col("__k") % 10 === 0, array(lit(false), lit(true)))
            .otherwise(array(lit(false)))))
        .withColumn("TradeInAmount",
          when(col("__dup"), expr(dec2("130.0", "__p")))
            .otherwise(expr(dec2("120.0", "__p"))))
        .withColumn("TradeInDate",
          when(col("__dup"), concat(date_format(col("__ts") + expr("INTERVAL 1 DAY"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")))
            .otherwise(col("TradeInDate")))
      val empty = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TradeInSchema.targetSchema)
      val t1 = TradeInPipeline.mergeIntoTarget(empty,
        TradeInPipeline.stage(day1, nowLit(Now1)), nowLit(Now1))
      val t2 = TradeInPipeline.mergeIntoTarget(t1,
        TradeInPipeline.stage(day2, nowLit(Now2)),
        nowLit(Now2), actionCol = Some("action"))
      // Scope note for the bench ratio: the DuckDB oracle answers with a
      // minimal 7-column single full-outer join; this side deliberately
      // runs the PRODUCT pipeline — 44-col staging parse, dedup window,
      // typed projection, two audited merges — because q33 exists to
      // verify the pipeline, not to win the minimal-answer race.
      // ordered1, not orderBy: AQE turns both merge joins into broadcast
      // joins (no shuffle stage), so a range-sort's sampling pass would
      // re-execute the entire two-merge DAG a second time.
      t2.select(col("SaleInvoiceID"),
          col("TradeInAmount").cast("double").as("TradeInAmount"),
          col("TradeInDate"), col("TradeInDateEST"),
          col("ETLRowInsertedEST"), col("ETLRowUpdatedEST"), col("action"))
        .transform(QuerySupport.ordered1(_, col("SaleInvoiceID")))
    }),

    // M1 partition-scoped (SURVEY.md §4.3): the same two-day merge as
    // q33 run through the PRODUCTION disk path — Merge.upsertPartitioned
    // via the pipeline's default mergeIntoTargetPartitioned — then the
    // on-disk partitioned target read back. Only the partitions each
    // batch touches are rewritten; k%10 duplicates whose TradeInDate
    // moved +1 day across a month boundary exercise the moved-key probe
    // end-to-end. Month granularity, not day: this fixture spreads
    // trade-in days over ~7 years (a real daily feed touches 1–2 day
    // partitions), and day keying here would write thousands of 6-row
    // files per run. The oracle is q33's full-merge answer — the
    // partition-scoped path must be indistinguishable from the full
    // merge it replaces.
    "q129_tradein_merge_part" -> ((s, d) => {
      val base = narrowBase(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("k"))
        .persist()
      val day1 = widen(base.filter(col("k") % 3 =!= 0))
      val day2 = widen(base.filter(col("k") % 2 === 0))
        .withColumn("__dup", explode(
          when(col("__k") % 10 === 0, array(lit(false), lit(true)))
            .otherwise(array(lit(false)))))
        .withColumn("TradeInAmount",
          when(col("__dup"), expr(dec2("130.0", "__p")))
            .otherwise(expr(dec2("120.0", "__p"))))
        .withColumn("TradeInDate",
          when(col("__dup"), concat(date_format(col("__ts") + expr("INTERVAL 1 DAY"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")))
            .otherwise(col("TradeInDate")))
      val workRoot = java.nio.file.Files.createTempDirectory("graft_q129")
      // createTempDirectory does NOT delete at exit; without cleanup every
      // invocation leaks a full partitioned parquet table into /tmp
      registerTempDir(workRoot)
      val work = workRoot.toString + "/target"
      val month = date_format(col("TradeInDate"), "yyyy-MM")
      TradeInPipeline.mergeIntoTargetPartitioned(s, work,
        TradeInPipeline.stage(day1, nowLit(Now1)), nowLit(Now1), partDay = month)
      TradeInPipeline.mergeIntoTargetPartitioned(s, work,
        TradeInPipeline.stage(day2, nowLit(Now2)), nowLit(Now2), partDay = month)
      base.unpersist()
      // Read-back is the query's answer: the product of this operator is
      // the on-disk table. (The temp dir is left for process exit.)
      // ordered1, not orderBy: a range-sort's sampling pass would read
      // the 81-dir partitioned target a second time; one-partition sort
      // of the 37k-row answer reads it once (the q33 discipline).
      s.read.parquet(work)
        .select(col("SaleInvoiceID"),
          col("TradeInAmount").cast("double").as("TradeInAmount"),
          col("TradeInDate"), col("TradeInDateEST"),
          col("ETLRowInsertedEST"), col("ETLRowUpdatedEST"))
        .transform(QuerySupport.ordered1(_, col("SaleInvoiceID")))
    }))

  // ------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = Map(

    "q31_tradein_stage" -> {
      val dT = parsedDuck("ts", "k % 5", Now1)
      val dP = parsedDuck("ts", "(k + 1) % 5", Now1)
      val dR = parsedDuck("ts", "(k + 2) % 5", Now1)
      s"""WITH $baseCteDuck,
         |norm AS (SELECT k, $dT AS dt, $dP AS dp, $dR AS dr FROM base)
         |SELECT CAST(k AS STRING) AS SaleInvoiceID,
         | strftime(dt, '%Y-%m-%d %H:%M:%S.%f') AS TradeInDate,
         | ${estStrDuck("dt")} AS TradeInDateEST,
         | strftime(dp, '%Y-%m-%d %H:%M:%S.%f') AS PostTime,
         | ${estStrDuck("dp")} AS PostTimeEST,
         | strftime(dr, '%Y-%m-%d %H:%M:%S.%f') AS ResponseTime,
         | ${estStrDuck("dr")} AS ResponseTimeEST,
         | TIMESTAMP '$Now1' AS ETLRowInsertedEST
         |FROM norm ORDER BY k""".stripMargin
    },

    "q32_tradein_typed" -> {
      val dT = parsedDuck("ts", "k % 5", Now1)
      val dP = parsedDuck("ts", "(k + 1) % 5", Now1)
      val dR = parsedDuck("ts", "(k + 2) % 5", Now1)
      // Typed value per column: ints/strings cast straight off the shared
      // raw text; decimals string→DECIMAL→DOUBLE; timestamps from the
      // known-shape parse (+ EST seconds truncation).
      val outCols = TradeInSchema.columns.map { c =>
        val raw = rawSpec.toMap.get(c)
        c match {
          case "TradeInDate"     => s"dt AS $c"
          case "TradeInDateEST"  => s"${estTsDuck("dt")} AS $c"
          case "PostTime"        => s"dp AS $c"
          case "PostTimeEST"     => s"${estTsDuck("dp")} AS $c"
          case "ResponseTime"    => s"dr AS $c"
          case "ResponseTimeEST" => s"${estTsDuck("dr")} AS $c"
          case _ if TradeInSchema.intCols(c) =>
            s"CAST(${raw.get} AS INT) AS $c"
          case _ if TradeInSchema.decimalCols(c) =>
            s"CAST(CAST(${raw.get} AS DECIMAL(18,2)) AS DOUBLE) AS $c"
          case _ => s"${raw.get} AS $c"
        }
      }
      s"""WITH $baseCteDuck,
         |norm AS (SELECT k, c, p, st, pri, $dT AS dt, $dP AS dp, $dR AS dr FROM base)
         |SELECT ${outCols.mkString(",\n ")}
         |FROM norm ORDER BY SaleInvoiceID""".stripMargin
    },

    "q33_tradein_merge_2run" -> {
      val d1 = parsedDuck("ts", "k % 5", Now1)
      // Day-2 winning row per key after the dedup window: the k%10=0
      // duplicate (shape 0, ts+1 day, amount*1.3) out-sorts its base row.
      val d2base = parsedDuck("ts", "k % 5", Now2)
      s"""WITH $baseCteDuck,
         |day1 AS (SELECT k, $d1 AS dt,
         |   CAST(CAST(${dec2("110.0")} AS DECIMAL(18,2)) AS DOUBLE) AS amt
         |  FROM base WHERE k % 3 <> 0),
         |day2 AS (SELECT k,
         |   CASE WHEN k % 10 = 0 THEN ts + INTERVAL 1 DAY ELSE $d2base END AS dt,
         |   CAST(CAST(CASE WHEN k % 10 = 0 THEN ${dec2("130.0")} ELSE ${dec2("120.0")} END AS DECIMAL(18,2)) AS DOUBLE) AS amt
         |  FROM base WHERE k % 2 = 0)
         |SELECT CAST(COALESCE(d2.k, d1.k) AS INT) AS SaleInvoiceID,
         | CASE WHEN d2.k IS NOT NULL THEN d2.amt ELSE d1.amt END AS TradeInAmount,
         | CASE WHEN d2.k IS NOT NULL THEN d2.dt ELSE d1.dt END AS TradeInDate,
         | ${estTsDuck("CASE WHEN d2.k IS NOT NULL THEN d2.dt ELSE d1.dt END")} AS TradeInDateEST,
         | CASE WHEN d1.k IS NOT NULL THEN TIMESTAMP '$Now1' ELSE TIMESTAMP '$Now2' END AS ETLRowInsertedEST,
         | CASE WHEN d2.k IS NOT NULL AND d1.k IS NOT NULL THEN TIMESTAMP '$Now2' END AS ETLRowUpdatedEST,
         | CASE WHEN d2.k IS NOT NULL AND d1.k IS NOT NULL THEN 'update'
         |      WHEN d2.k IS NOT NULL THEN 'insert' ELSE 'keep' END AS action
         |FROM day1 d1 FULL OUTER JOIN day2 d2 ON d1.k = d2.k
         |ORDER BY SaleInvoiceID""".stripMargin
    },

    // q33's oracle minus the action column: the partition-scoped disk
    // path must produce exactly the full merge's answer.
    "q129_tradein_merge_part" -> {
      val d1 = parsedDuck("ts", "k % 5", Now1)
      val d2base = parsedDuck("ts", "k % 5", Now2)
      s"""WITH $baseCteDuck,
         |day1 AS (SELECT k, $d1 AS dt,
         |   CAST(CAST(${dec2("110.0")} AS DECIMAL(18,2)) AS DOUBLE) AS amt
         |  FROM base WHERE k % 3 <> 0),
         |day2 AS (SELECT k,
         |   CASE WHEN k % 10 = 0 THEN ts + INTERVAL 1 DAY ELSE $d2base END AS dt,
         |   CAST(CAST(CASE WHEN k % 10 = 0 THEN ${dec2("130.0")} ELSE ${dec2("120.0")} END AS DECIMAL(18,2)) AS DOUBLE) AS amt
         |  FROM base WHERE k % 2 = 0)
         |SELECT CAST(COALESCE(d2.k, d1.k) AS INT) AS SaleInvoiceID,
         | CASE WHEN d2.k IS NOT NULL THEN d2.amt ELSE d1.amt END AS TradeInAmount,
         | CASE WHEN d2.k IS NOT NULL THEN d2.dt ELSE d1.dt END AS TradeInDate,
         | ${estTsDuck("CASE WHEN d2.k IS NOT NULL THEN d2.dt ELSE d1.dt END")} AS TradeInDateEST,
         | CASE WHEN d1.k IS NOT NULL THEN TIMESTAMP '$Now1' ELSE TIMESTAMP '$Now2' END AS ETLRowInsertedEST,
         | CASE WHEN d2.k IS NOT NULL AND d1.k IS NOT NULL THEN TIMESTAMP '$Now2' END AS ETLRowUpdatedEST
         |FROM day1 d1 FULL OUTER JOIN day2 d2 ON d1.k = d2.k
         |ORDER BY SaleInvoiceID""".stripMargin
    })
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{RelationalQueries, TextQueries, DedupQueries, SimilarityQueries, CurationQueries, EvalQueries, StatsQueries, EventsQueries, ProfilingQueries}

/** Driver contract (SURVEY.md §7): one `queries` entry per implemented
  * operator, each with equivalent ANSI SQL for the DuckDB oracle.
  *
  * The registry itself lives in per-family objects under
  * [[graft.queries]] (round-12 split — the single-file registry had
  * grown to 8k+ lines); this object is the stable aggregation facade
  * the harness mains and specs consume. Shared helpers (deterministic
  * final ordering, exact decimal aggregation, oracle SQL fragments)
  * are in [[graft.QuerySupport]].
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

  /** Flagship (driver t1 smoke, sf0.001): the reference's core
    * dedup-then-MERGE shape on the corpus. */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_merge_upsert")(spark, "/root/testdata/sf0.001")

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracleSql),
    (TextQueries.queries, TextQueries.oracleSql),
    (DedupQueries.queries, DedupQueries.oracleSql),
    (SimilarityQueries.queries, SimilarityQueries.oracleSql),
    (CurationQueries.queries, CurationQueries.oracleSql),
    (EvalQueries.queries, EvalQueries.oracleSql),
    (StatsQueries.queries, StatsQueries.oracleSql),
    (EventsQueries.queries, EventsQueries.oracleSql),
    (ProfilingQueries.queries, ProfilingQueries.oracleSql),
    (TradeInQueries.queries, TradeInQueries.oracleSql),
    (MediaQueries.queries, MediaQueries.oracleSql),
  )

  /** One entry per operator. Families must be key-disjoint — a `++`
    * would silently drop a colliding entry, so the union is size-checked
    * (EntryContractSpec also pins queries/oracle key equality). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = families.iterator.map(_._1).reduce(_ ++ _)
    require(merged.size == families.iterator.map(_._1.size).sum,
      "duplicate query keys across family objects")
    merged
  }

  val oracleSql: Map[String, String] = {
    val merged = families.iterator.map(_._2).reduce(_ ++ _)
    require(merged.size == families.iterator.map(_._2.size).sum,
      "duplicate oracle keys across family objects")
    merged
  }
}

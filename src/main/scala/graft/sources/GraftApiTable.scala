package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1's scale mapping as a REAL catalog source: the windowed API backfill
  * (see [[PartitionedWindowSource]], which proved the shape as an
  * RDD-of-lines) exposed through DataSourceV2, so a years × locations
  * backfill is addressable as
  *
  * {{{
  * spark.read.format("graft-api")
  *   .option("urlTemplate", "https://host/api?start={StartDate}&end={StopDate}")
  *   .option("windows", """[{"StartDate":"...","StopDate":"..."}, ...]""")
  *   .load()
  * }}}
  *
  * Each window in the JSON `windows` array becomes ONE DSv2 input
  * partition, so N windows → N concurrent executor-side fetches — the
  * reference drains the same windows sequentially on a single driver
  * (rqtradein_etl.py:203-227). `{key}` placeholders in `urlTemplate` are
  * substituted from the window's entries; `file:`/plain paths work too
  * (the offline test fixture), as does any URL the executor can open.
  *
  * Output schema is `(window STRING, value STRING)` — the raw payload
  * lines tagged with their window's JSON, to be parsed with
  * `from_json(value, schema)` exactly like the RDD path — PLUS one
  * string column per window-param key (the sorted union across
  * windows). The param columns are this source's partition columns in
  * the Hive sense: constant per window, known at PLAN time from the
  * `windows` option, so predicates on them prune whole windows before
  * any fetch happens.
  *
  * Filter pushdown ([[SupportsPushDownFilters]], round 17): predicates
  * that reference ONLY param columns and have a shape evaluable against
  * a per-window string constant (=, <, <=, >, >=, IN, IS NOT NULL,
  * STARTSWITH — string comparison, which IS date order for the
  * reference's ISO-formatted `StartDate`/`StopDate` params,
  * rq_tradein_report/__init__.py:12-20) are accepted and evaluated at
  * `planInputPartitions`: a window that fails them is never planned,
  * never fetched. A backfill caller writing
  * `.load().filter($"StartDate" >= "2024-01-01")` therefore prunes
  * server-side (zero bytes moved for excluded windows) instead of
  * caller-side. Everything else — anything touching `value`/`window`,
  * or a non-string-comparable shape — is returned as residual for Spark
  * to evaluate post-scan, so semantics never depend on the pushdown.
  * Deliberately NOT implemented: schema inference over live endpoints
  * (a backfill source must never 2×-fetch to guess types). Per-window
  * retry/backoff composes inside the fetch via [[Retry.withBackoff]] on
  * the HTTP layer, not here.
  */
class GraftApiTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftApiTable.schemaFor(
      GraftApiTable.parseWindows(options.getOrDefault("windows", "[]")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftApiTable(properties.asScala.toMap)
}

object GraftApiTable {
  val baseSchema: StructType = StructType(Seq(
    StructField("window", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Base columns plus the sorted union of window-param keys as string
    * partition columns. A param literally named `window`/`value` stays
    * reachable through the `window` JSON but gets no column (the base
    * contract wins the name). */
  def schemaFor(windows: Seq[Map[String, String]]): StructType = {
    val base = baseSchema.fieldNames.toSet
    val keys = windows.flatMap(_.keys).distinct.sorted.filterNot(base)
    StructType(baseSchema.fields ++
      keys.map(StructField(_, StringType, nullable = true)))
  }

  /** Minimal parse of the `windows` option: a JSON array of flat string
    * objects. Jackson is already on every Spark classpath. */
  def parseWindows(json: String): Seq[Map[String, String]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root.isArray, s"windows must be a JSON array, got: $json")
    (0 until root.size).map { i =>
      val o = root.get(i)
      require(o.isObject, s"windows[$i] must be an object, got: $o")
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
  }

  def resolve(template: String, params: Map[String, String]): String =
    params.foldLeft(template) { case (t, (k, v)) => t.replace(s"{$k}", v) }
}

final class GraftApiTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-api"
  override def schema(): StructType = GraftApiTable.schemaFor(
    GraftApiTable.parseWindows(properties.getOrElse("windows", "[]")))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters {
      private val template = options.getOrDefault("urlTemplate",
        properties.getOrElse("urlTemplate",
          sys.error("graft-api requires an urlTemplate option")))
      private val windows = GraftApiTable.parseWindows(
        options.getOrDefault("windows", properties.getOrElse("windows", "[]")))
      private val fullSchema = GraftApiTable.schemaFor(windows)
      // Column pruning: a value-only projection (the common shape — the
      // window tag is provenance) should not carry the window JSON or
      // the param columns through every row. The fetch itself is
      // all-or-nothing (a remote window has no sub-column granularity),
      // so pruning trims the rows emitted, not the bytes fetched.
      private var required: StructType = fullSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // Partition-filter pushdown: accept exactly the filters we can
      // decide per window from its constant params; everything else is
      // residual. `window`/`value` never qualify — their values are
      // row-level (value) or redundant with the params (window).
      private var pushed: Array[Filter] = Array.empty
      private def paramKeys = fullSchema.fieldNames.toSet --
        GraftApiTable.baseSchema.fieldNames
      private def evaluable(f: Filter): Boolean =
        f.references.nonEmpty && f.references.forall(paramKeys) && (f match {
          case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
               _: LessThan | _: LessThanOrEqual | _: In | _: IsNotNull |
               _: StringStartsWith => true
          case _ => false
        })
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (ok, residual) = filters.partition(evaluable)
        pushed = ok
        residual
      }
      override def pushedFilters(): Array[Filter] = pushed

      /** SQL three-valued semantics on a per-window constant: a window
        * missing the referenced key compares as NULL → not selected.
        * Pushed filters are TRUSTED (Spark does not re-evaluate them),
        * so two divergences from Spark's own evaluation were latent
        * wrong-rows bugs (round-18 ADVICE):
        *  - a NULL literal operand compares as NULL → not selected; the
        *    old `String.valueOf(null)` mapped it to the string "null",
        *    which a param literally equal to "null" then matched;
        *  - range comparisons must use UTF8String binary (code-point)
        *    order, the order Spark itself evaluates StringType
        *    comparisons in — Java's UTF-16 `compareTo` diverges for
        *    supplementary-plane characters. */
      private def cmp(x: String, v: Any): Int =
        UTF8String.fromString(x).compareTo(UTF8String.fromString(String.valueOf(v)))
      private def keeps(w: Map[String, String], f: Filter): Boolean = f match {
        case EqualTo(a, v) =>
          v != null && w.get(a).contains(String.valueOf(v))
        case GreaterThan(a, v) => v != null && w.get(a).exists(cmp(_, v) > 0)
        case GreaterThanOrEqual(a, v) =>
          v != null && w.get(a).exists(cmp(_, v) >= 0)
        case LessThan(a, v) => v != null && w.get(a).exists(cmp(_, v) < 0)
        case LessThanOrEqual(a, v) =>
          v != null && w.get(a).exists(cmp(_, v) <= 0)
        case In(a, vs) => w.get(a).exists(x =>
          vs.filter(_ != null).map(String.valueOf).contains(x))
        case IsNotNull(a) => w.contains(a)
        // null guard for consistency with every other case (Spark
        // constant-folds a null startsWith pattern today, but a trusted
        // pushdown must not NPE if that ever changes — round-18 ADVICE)
        case StringStartsWith(a, p) =>
          p != null && w.get(a).exists(_.startsWith(p))
        case _ => true // unreachable: evaluable() gates admission
      }

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def description(): String =
        s"graft-api PushedFilters: ${pushed.mkString("[", ", ", "]")}"
      // The contract under test: one window == one input partition —
      // AFTER pushed-filter pruning, so an excluded window is never
      // planned, never fetched.
      override def planInputPartitions(): Array[InputPartition] =
        windows.filter(w => pushed.forall(keeps(w, _)))
          .map(w => WindowPartition(
            GraftApiTable.resolve(template, w),
            w.toSeq.sorted.map { case (k, v) => s""""$k":"$v"""" }
              .mkString("{", ",", "}"),
            w): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new WindowReaderFactory(required.fieldNames)
    }
}

private[sources] final case class WindowPartition(url: String,
    windowJson: String, params: Map[String, String]) extends InputPartition

private[sources] final class WindowReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WindowPartition]
    new PartitionReader[InternalRow] {
      private val source =
        if (p.url.contains("://")) scala.io.Source.fromURL(new java.net.URI(p.url).toURL)
        else scala.io.Source.fromFile(p.url)
      private val lines = source.getLines()
      private val window = UTF8String.fromString(p.windowJson)
      // param columns are per-partition constants — materialized once
      private val paramValues: Map[String, UTF8String] =
        p.params.map { case (k, v) => k -> UTF8String.fromString(v) }
      private var current: UTF8String = _
      override def next(): Boolean =
        if (lines.hasNext) { current = UTF8String.fromString(lines.next()); true }
        else false
      override def get(): InternalRow = InternalRow(fields.map {
        case "window" => window
        case "value" => current
        case k => paramValues.getOrElse(k, null)
      }: _*)
      override def close(): Unit = source.close()
    }
  }
}

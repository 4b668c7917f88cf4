package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 shape of the windowed API source: catalog-addressable backfill
  * where each window is one input partition (executor-parallel fetch). */
class GraftApiTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-api-fixture")
    Files.writeString(dir.resolve("w1.json"),
      """{"id":1,"loc":"a"}
        |{"id":2,"loc":"a"}""".stripMargin)
    Files.writeString(dir.resolve("w2.json"),
      """{"id":3,"loc":"b"}""".stripMargin)
    Files.writeString(dir.resolve("w3.json"), "")
    dir.toString
  }

  test("graft-api: N windows -> N input partitions, lines tagged by window") {
    val dir = fixture()
    val df = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows", """[{"W":"w1"},{"W":"w2"},{"W":"w3"}]""")
      .load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 3) // w3 is an empty window
    val byWindow = df.groupBy("window").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byWindow == Map("""{"W":"w1"}""" -> 2L, """{"W":"w2"}""" -> 1L))
    // the RDD path's parse idiom works unchanged on the DSv2 output
    val parsed = df.select(from_json(col("value"),
        StructType(Seq(StructField("id", LongType), StructField("loc", StringType))))
        .as("r"))
      .select("r.id", "r.loc")
    assert(parsed.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("graft-api: value-only projection prunes the window column at the scan") {
    val dir = fixture()
    val df = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows", """[{"W":"w1"},{"W":"w2"}]""")
      .load()
      .select("value")
    val scanSchema = df.queryExecution.executedPlan.collectLeaves()
      .map(_.schema.fieldNames.toSeq).head
    assert(scanSchema == Seq("value"), s"scan not pruned: $scanSchema")
    assert(df.count() == 3)
  }

  test("graft-api: date-range filters push down and prune windows at plan time") {
    val dir = fixture()
    // Reuse the fixture files as three dated windows: the StartDate param
    // is this source's partition column (constant per window, known at
    // plan time), so the range predicate must prune w1 BEFORE any fetch.
    val df = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows",
        """[{"W":"w1","StartDate":"2024-01-01"},
          | {"W":"w2","StartDate":"2024-02-01"},
          | {"W":"w3","StartDate":"2024-03-01"}]""".stripMargin)
      .load()
      .filter(col("StartDate") >= "2024-02-01")
    // plan-time pruning: only w2+w3 become input partitions (w1's file is
    // never opened — one window == one partition, post-filter)
    assert(df.rdd.getNumPartitions == 2,
      s"windows not pruned: ${df.rdd.getNumPartitions} partitions")
    // the filter was ACCEPTED by the scan (visible in its description),
    // not just re-applied post-scan
    val scanDesc = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanDesc.contains("PushedFilters") || df.queryExecution
      .optimizedPlan.toString.contains("GreaterThanOrEqual"),
      s"no pushdown evidence in plan:\n$scanDesc")
    assert(df.count() == 1) // only w2 has a row; w3 is empty
    assert(df.select("StartDate").distinct().collect()
      .map(_.getString(0)).toSet == Set("2024-02-01"))
    // a window missing the referenced key compares as NULL -> pruned
    val missing = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows", """[{"W":"w1","StartDate":"2024-01-01"},{"W":"w2"}]""")
      .load()
      .filter(col("StartDate") < "2024-06-01")
    assert(missing.rdd.getNumPartitions == 1)
    // value-level predicates stay residual: Spark evaluates them
    val residual = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows", """[{"W":"w1","StartDate":"2024-01-01"}]""")
      .load()
      .filter(col("value").contains("\"id\":2"))
    assert(residual.rdd.getNumPartitions == 1) // no param pruning possible
    assert(residual.count() == 1)
  }

  test("graft-api: pushed filters match Spark's own comparison semantics " +
    "(NULL In-elements never select; range uses code-point order)") {
    val dir = fixture()
    // Pushed filters are TRUSTED — Spark does not re-evaluate them — so
    // keeps() must reproduce SQL three-valued logic exactly. A window
    // whose param is the literal STRING "null" must not be selected by a
    // NULL element of an In filter (the old String.valueOf(null) bridge
    // made exactly that match).
    val inNull = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows",
        """[{"W":"w1","StartDate":"null"},
          | {"W":"w2","StartDate":"2024-02-01"}]""".stripMargin)
      .load()
      .filter(col("StartDate").isin(null, "2024-02-01"))
    assert(inNull.rdd.getNumPartitions == 1,
      "a 'null' string param matched a NULL In element")
    assert(inNull.count() == 1) // w2 only
    // Range pushdown must compare in UTF8String (code-point) order, the
    // order Spark itself evaluates StringType comparisons in. U+1F600 is
    // a supplementary-plane char: surrogate-pair UTF-16 order puts it
    // BELOW U+FFFD, code-point order puts it ABOVE.
    val emoji = new String(Character.toChars(0x1F600))
    val range = spark.read.format("graft-api")
      .option("urlTemplate", s"$dir/{W}.json")
      .option("windows", s"""[{"W":"w1","Tag":"$emoji"}]""")
      .load()
      .filter(col("Tag") > "\uFFFD")
    assert(range.rdd.getNumPartitions == 1,
      "code-point-greater param pruned by UTF-16 comparison")
    assert(range.count() == 2) // w1 has two rows
  }

  test("graft-api: short name resolves via DataSourceRegister and url templating substitutes all keys") {
    assert(GraftApiTableSpec.resolvedExample ==
      "https://h/api?s=2024-01-01&e=2024-01-02&l=7")
  }
}

object GraftApiTableSpec {
  private[graft] val resolvedExample = graft.sources.GraftApiTable.resolve(
    "https://h/api?s={StartDate}&e={StopDate}&l={Loc}",
    Map("StartDate" -> "2024-01-01", "StopDate" -> "2024-01-02", "Loc" -> "7"))
}

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

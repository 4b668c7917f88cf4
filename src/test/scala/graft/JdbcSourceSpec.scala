package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcSource, PartitionedWindowSource}

/** S3 integration proof: a real `spark.write/read.format("jdbc")`
  * round-trip through embedded Apache Derby (the one JDBC engine on the
  * Spark classpath) — the same code path a SQL-Server URL + driver jar
  * exercises against the reference's target (rqtradein_etl.py:199-202).
  * Plus S1-at-scale: the window-partitioned parallel fetch. */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("JdbcSource round-trips a frame through embedded Derby") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("graft-derby")
      .resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val in = Seq((1, "INV-1", 110.50), (2, "INV-2", 220.25), (3, "INV-3", 0.0))
      .toDF("id", "invoice", "amount")
    in.write.format("jdbc")
      .option("url", url).option("dbtable", "tradein")
      .option("driver", derbyDriver)
      .mode("overwrite").save()
    val back = new JdbcSource("tradein", url,
      Map("driver" -> derbyDriver)).fetch(spark, Map.empty)
    assert(back.count() == 3)
    assert(back.orderBy("id").select("invoice").as[String].collect().toSeq ==
      Seq("INV-1", "INV-2", "INV-3"))
    assert(back.agg(sum(col("amount"))).as[Double].head() == 330.75)
  }

  test("JdbcSource pushes filters down to the database scan") {
    val db = java.nio.file.Files.createTempDirectory("graft-derby")
      .resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    import spark.implicits._
    (1 to 100).map(i => (i, s"r$i")).toDF("id", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t100")
      .option("driver", derbyDriver).mode("overwrite").save()
    val scan = new JdbcSource("t100", url, Map("driver" -> derbyDriver))
      .fetch(spark, Map.empty)
      .filter(col("id") > 90)
    // JDBCScan prints its PushedFilters — the predicate must reach the
    // database, not run post-scan in Spark.
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
    assert(scan.count() == 10)
  }

  test("PartitionedWindowSource fetches N windows on N distinct tasks") {
    val windows = (1 to 6).map(i => Map("StartDate" -> f"2024-06-$i%02d"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("row",
        org.apache.spark.sql.types.IntegerType)))
    // Executor-side "fetch": emits 3 records per window stamped with the
    // task's partition id, proving where the fetch ran.
    val src = new PartitionedWindowSource(windows, w => {
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val day = w("StartDate")
      (1 to 3).iterator.map(r => s"""{"day":"$day","part":$pid,"row":$r}""")
    }, schema)
    val out = src.fetch(spark, Map.empty).persist()
    assert(out.count() == 18)
    // every window fetched, and no two windows shared a task
    assert(out.select("day").distinct().count() == 6)
    assert(out.select("part").distinct().count() == 6)
    assert(out.groupBy("day").agg(countDistinct(col("part")).as("p"))
      .filter(col("p") =!= 1).isEmpty)
    out.unpersist()
  }
}

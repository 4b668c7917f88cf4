package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): times every SparkEntry.queries entry
  * at `SPARK_GRAFT_SF_DIR` and emits ONE JSON line. The line is printed to
  * stdout (unprefixed — build.sbt sets `run / outputStrategy :=
  * StdoutOutput` so sbt doesn't wrap it in `[info]`) AND written to
  * `BENCH_local.json` so a log-scraping failure can never lose the result.
  * Query failures are recorded explicitly in a `failed` array instead of
  * being swallowed into a normal-looking elapsed time. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)
    // JVM warmup so the first measured query doesn't absorb codegen
    // compiler, scheduler, and parquet-reader startup cost (q01 runs
    // first alphabetically and was paying ~2s of one-time init).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).limit(64).collect()
      catch { case _: Throwable => () }
    }
    val failures = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets column pruning skip a
      // projection query's actual work, flattering the number. The noop
      // write materializes every output row/column and discards it —
      // comparable to what the DuckDB oracle executes.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failures += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")), line + "\n")
    spark.stop()
  }
}

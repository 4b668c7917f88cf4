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
      // Static conf, must precede session creation: the default generated-
      // class cache holds 100 entries; 45 queries × several codegen stages
      // × 2 timed runs thrash it, so re-runs pay full Janino compilation
      // (measured ~3.5 s on the window queries) instead of a cache hit.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map.empty[String, Double]
    // noop sink, not count(): count() lets column pruning skip a
    // projection query's actual work, flattering the number. The noop
    // write materializes every output row/column and discards it —
    // comparable to what the DuckDB oracle executes.
    // Best-of-3, taken across three full SUITE passes rather than three
    // back-to-back runs: host slowdowns arrive in sustained stretches, so
    // consecutive repeats of one query all land in the same stretch, while
    // suite-separated repeats decorrelate. Pass 1 additionally absorbs
    // each shape's codegen/JIT cost, so passes 2-3 measure steady state.
    // Full-suite wall cost ~3× ≈ 2.5 min.
    // Wall-clock budget: on a badly noisy host stretch a pass can take
    // several minutes; passes 2-3 are accuracy refinements, so skip them
    // rather than risk the harness's overall timeout. Pass 1 always runs
    // to completion (every query needs at least one measurement). 450 s
    // admits all 3 passes at the measured ~110-130 s/pass — round 2's
    // 240 s cut pass 3 and left the gate number a best-of-2 coin flip on
    // a host with ~2× timing noise.
    val budgetMillis =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "450").toLong * 1000L
    val suiteStart = System.nanoTime()
    def emit(): String = {
      val results = names.map(n => n -> best.getOrElse(n, -1.0))
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = results.map(_._2).sum
      val line =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
      // Never let a checkpoint-write failure take the result with it —
      // the stdout line (printed by the caller) is the primary channel.
      try Files.writeString(Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")), line + "\n")
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] result-file write failed: ${e.getMessage}")
      }
      line
    }
    var lastPassMillis = 0L
    for (pass <- 1 to 3) {
      val elapsed = (System.nanoTime() - suiteStart) / 1000000L
      // Start a refinement pass only if the LAST pass's duration also
      // fits in what remains — starting one at budget-minus-epsilon on a
      // slow host would blow past any outer harness timeout.
      if (pass == 1 || elapsed + lastPassMillis < budgetMillis) {
        val passStart = System.nanoTime()
        for (name <- names) {
          val fn = SparkEntry.queries(name)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val t = (System.nanoTime() - t0) / 1e9
            if (t < best.getOrElse(name, Double.MaxValue)) best(name) = t
          } catch { case e: Throwable =>
            if (!failures.contains(name)) {
              failures += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
          }
          // Queries that persist intermediates (e.g. the staged fixture
          // in q33) must not leak cached blocks into later queries'
          // memory.
          spark.catalog.clearCache()
        }
        lastPassMillis = (System.nanoTime() - passStart) / 1000000L
        // Checkpoint the cumulative best after EVERY pass: if an outer
        // timeout kills pass N+1 mid-flight, the file still holds a
        // complete pass-N result instead of nothing.
        emit()
      }
      else System.err.println(s"[bench] pass $pass skipped: wall budget exhausted")
    }
    println(emit())
    spark.stop()
  }
}

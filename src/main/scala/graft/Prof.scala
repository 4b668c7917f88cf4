package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    SparkEntry.singlePartitionFinals = true // harness JVM: bench-scale finals
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configure(spark)
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min ${ts.min}%.2f  runs ${ts.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._
    def asofPair(native: Boolean) = {
      val left = spark.read.parquet(s"$d/events.parquet")
        .select(col("event_id"), col("user_id").as("k"), col("ts"))
      val right = spark.read.parquet(s"$d/orders.parquet")
        .groupBy(col("o_custkey").as("k"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("price"))
        .withColumnRenamed("o_orderdate", "od")
      if (native)
        graft.operators.Relational.asofJoinNative(left, right, "k", "ts",
          "od", Seq("price"))
      else
        graft.operators.Relational.asofJoin(left, right, "k", "ts", "od",
          Seq("price"))
    }
    if (args.headOption.contains("asof_ab")) {
      (1 to 2).foreach { _ =>
        t("asof_composed")(asofPair(native = false))
        t("asof_native")(asofPair(native = true))
      }
    } else {
      val names = if (args.nonEmpty) args.toSeq else Seq("q33_tradein_merge_2run")
      names.foreach(n => t(n)(SparkEntry.queries(n)(spark, d)))
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables.{load, parallel}
import graft.functions.TextFunctions

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min ${ts.min}%.2f  runs ${ts.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = load(spark, d, "documents")
    t("docs_scan")(docs)
    t("exact_only")(parallel(docs).select(col("doc_id"), TextFunctions.exactFingerprint(col("text")).as("f")))
    t("winnow_only")(parallel(docs).select(col("doc_id"), TextFunctions.winnowFingerprint(col("text")).as("f")))
    t("both_no_order")(parallel(docs).select(col("doc_id"),
      TextFunctions.exactFingerprint(col("text")).as("fp_exact"),
      TextFunctions.winnowFingerprint(col("text")).as("fp_winnow")))
    t("q28_full")(SparkEntry.queries("q28_fingerprint")(spark, d))
    t("no_parallel")(docs.select(col("doc_id"),
      TextFunctions.exactFingerprint(col("text")).as("fp_exact"),
      TextFunctions.winnowFingerprint(col("text")).as("fp_winnow"))
      .transform(SparkEntry.ordered1(_, col("doc_id"))))
    t("q45")(SparkEntry.queries("q45_percentile")(spark, d))
    t("q01")(SparkEntry.queries("q01_pricing_summary")(spark, d))
    t("q33")(SparkEntry.queries("q33_tradein_merge_2run")(spark, d))
    spark.stop()
  }
}

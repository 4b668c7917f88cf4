package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables.load

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val l = load(spark, d, "lineitem")
    t("scan_only")(l)
    t("warm_scan")(l)
    val dbl = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n"))
    t("agg_double")(dbl)
    def dec(c: org.apache.spark.sql.Column, s: Int) = c.cast(DecimalType(18, s))
    val decq = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"), 2)).as("a"), sum(dec(col("l_extendedprice"), 2)).as("b"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("c"),
        count(lit(1)).as("n"))
    t("agg_decimal")(decq)
    t("q01_full")(SparkEntry.queries("q01_pricing_summary")(spark, d))
    spark.stop()
  }
}

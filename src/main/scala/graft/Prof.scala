package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables.load
import graft.operators.TextDedup
object Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val docs = load(spark, d, "documents")
    t("warmup")(docs.count())
    val sigs = TextDedup.minhashSignatures(docs, "text", "doc_id", 4, 3)
    t("sigs")(sigs.count())
    t("sigs_again")(sigs.count())
    val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
    t("pairs")(pairs.count())
    val jac = TextDedup.jaccardOnPairs(pairs, docs, "text", "doc_id")
    t("jaccard_full")(jac.count())
    spark.stop()
  }
}

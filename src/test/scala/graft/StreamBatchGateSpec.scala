package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingEtl

/** Stream≡batch equivalence GATE with a committed artifact (round-19
  * verdict item 7): the equivalences StreamingSpec asserts are re-run
  * here as row-for-row / value-for-value comparisons and their COUNTS
  * are written to `STREAMING_GATE_r19.json`, so the driver record
  * carries the numbers behind the green bit, not just the bit. The
  * inputs are fixed and every compared quantity is deterministic
  * (md5-ordered sketches, literal timestamps), so regenerating the
  * artifact is idempotent. */
class StreamBatchGateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stream paths reproduce their batch duals; gate artifact emitted") {
    // --- 1. AvailableNow ingest ≡ the batch pipeline's two-merge run —
    val work = java.nio.file.Files.createTempDirectory("sbgate").toString
    val src = s"$work/in"; new java.io.File(src).mkdirs()
    def record(id: String, amt: String) =
      s"""{"SaleInvoiceID": "$id", "TradeInDate": "2024-06-01T01:00:00Z", "TradeInAmount": "$amt"}"""
    def writeBatch(name: String, lines: String*): Unit = {
      val f = new java.io.PrintWriter(s"$src/$name")
      lines.foreach(f.println); f.close()
    }
    val now = () => lit("2024-06-01 06:00:00").cast("timestamp")
    writeBatch("b1.json", record("1", "10.00"), record("2", "20.00"))
    StreamingEtl.ingestAvailableNow(spark, src, s"$work/ts", s"$work/ckpt",
      now = now)
    writeBatch("b2.json", record("2", "21.00"), record("3", "30.00"))
    StreamingEtl.ingestAvailableNow(spark, src, s"$work/ts", s"$work/ckpt",
      now = now)

    // batch dual: the same two files through the batch pipeline's
    // stage + partition-scoped merge, same injected now
    val rawSchema = org.apache.spark.sql.types.StructType(
      graft.pipeline.TradeInSchema.rawColumns.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    for (b <- Seq("b1", "b2"))
      graft.pipeline.TradeInPipeline.mergeIntoTargetPartitioned(
        spark, s"$work/tb",
        graft.pipeline.TradeInPipeline.stage(
          spark.read.schema(rawSchema).json(s"$src/$b.json"), now()),
        now())

    val cols = spark.read.parquet(s"$work/ts").columns.sorted
    def canon(path: String) = spark.read.parquet(path)
      .select(cols.map(c => col(c).cast("string")): _*)
      .orderBy(cols.map(col): _*).collect().map(_.toSeq).toSeq
    val streamRows = canon(s"$work/ts")
    val batchRows = canon(s"$work/tb")
    val ingestEqual = streamRows == batchRows
    assert(ingestEqual, s"stream target != batch target:\n$streamRows\nvs\n$batchRows")

    // --- 2. runningDistinct ≡ batch KMV over the same history ---------
    implicit val ctx = spark.sqlContext
    val inD = MemoryStream[(Long, String)]
    val qD = StreamingEtl.runningDistinct(inD.toDS(), k = 16)
      .writeStream.format("memory").queryName("gate_d")
      .outputMode(OutputMode.Update()).start()
    val d1 = (0 until 30).map(i => (1L, s"u${i % 25}"))
    val d2 = (0 until 30).map(i => (1L, s"u${i % 25 + 15}"))
    inD.addData(d1: _*); qD.processAllAvailable()
    inD.addData(d2: _*); qD.processAllAvailable()
    val streamEst = spark.table("gate_d").as[StreamingEtl.KeyedDistinct]
      .collect().filter(_.key == 1L).maxBy(_.n).estDistinct
    qD.stop()
    val batchEst = graft.operators.Profiling.approxDistinct(
        (d1 ++ d2).toDF("k", "v"), Seq("k"), col("v"), k = 16)
      .collect().head.getDouble(3)
    val distinctEqual = streamEst == batchEst
    assert(distinctEqual, s"stream $streamEst != batch $batchEst")

    // --- 3. runningSample ≡ batch bottom-k-by-md5 ---------------------
    val inS = MemoryStream[(Long, String)]
    val qS = StreamingEtl.runningSample(inS.toDS(), k = 8)
      .writeStream.format("memory").queryName("gate_s")
      .outputMode(OutputMode.Update()).start()
    val s1 = (0 until 30).map(i => (1L, s"v${i % 20}"))
    val s2 = (0 until 30).map(i => (1L, s"v${i % 20 + 10}"))
    inS.addData(s1: _*); qS.processAllAvailable()
    inS.addData(s2: _*); qS.processAllAvailable()
    val streamSample = spark.table("gate_s").as[StreamingEtl.KeyedSample]
      .collect().filter(_.key == 1L).maxBy(_.n).sample.toList
    qS.stop()
    val batchSample = (s1 ++ s2).map(_._2).distinct
      .map(v => org.apache.commons.codec.digest.DigestUtils.md5Hex(v) -> v)
      .sortBy(_._1).take(8).map(_._2).toList
    val sampleEqual = streamSample == batchSample
    assert(sampleEqual, s"stream $streamSample != batch $batchSample")

    // --- artifact ------------------------------------------------------
    val json =
      s"""{"gate":"stream_batch_equivalence",
         |"comparisons":{
         |"ingest_merge":{"rows_compared":${streamRows.size},"columns_compared":${cols.length},"equal":$ingestEqual},
         |"running_distinct":{"values_seen":${(d1 ++ d2).size},"stream_estimate":$streamEst,"batch_estimate":$batchEst,"equal":$distinctEqual},
         |"running_sample":{"sample_k":8,"values_seen":${(s1 ++ s2).size},"equal":$sampleEqual}},
         |"all_equal":${ingestEqual && distinctEqual && sampleEqual}}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMING_GATE_r19.json"), json + "\n")
  }
}

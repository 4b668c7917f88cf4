package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Concat-then-chunk sequence packing: offsets are per-shard running
  * sums in id order; a document's pack is where it STARTS. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences assigns per-shard offsets and budget-quantized pack ids") {
    val docs = Seq(
      // shard 0: tokens 60, 60, 60 -> starts 0, 60, 120 -> packs 0, 0, 1
      (1L, 0L, 60L), (2L, 0L, 60L), (3L, 0L, 60L),
      // shard 1: tokens 150, 10 -> starts 0, 150 -> packs 0, 1
      (4L, 1L, 150L), (5L, 1L, 10L)
    ).toDF("doc_id", "shard", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", "shard", 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(packed.toList == List(
      (1L, 0L, 0L), (2L, 60L, 0L), (3L, 120L, 1L),
      (4L, 0L, 0L), (5L, 150L, 1L)))
  }

  test("packSequences rejects a non-positive budget") {
    val docs = Seq((1L, 0L, 1L)).toDF("doc_id", "shard", "n_tokens")
    intercept[IllegalArgumentException] {
      Packing.packSequences(docs, "doc_id", "n_tokens", "shard", 0L)
    }
  }
}

package graft

import org.apache.spark.sql.functions.col
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

  test("chunkDocuments covers every token, overlaps by window-stride, clips the tail") {
    // 10 tokens, window 4, stride 3 -> ceil((10-4)/3)=2 extra chunks:
    // starts 1, 4, 7 covering [1-4], [4-7], [7-10].
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"), // shorter than window -> one short chunk
      (3L, "x1 x2 x3 x4 x5")) // ceil(1/3)=1 extra: [1-4], [4-5]
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "text", "doc_id", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toList == List(
      (1L, 0L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 7L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 1L, 2L, "a b"),
      (3L, 0L, 1L, 4L, "x1 x2 x3 x4"),
      (3L, 1L, 4L, 2L, "x4 x5")))
  }

  test("chunkDocuments rejects stride wider than window") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkDocuments(docs, "text", "doc_id", window = 4, stride = 5)
    }
  }

  test("packSequences rejects a non-positive budget") {
    val docs = Seq((1L, 0L, 1L)).toDF("doc_id", "shard", "n_tokens")
    intercept[IllegalArgumentException] {
      Packing.packSequences(docs, "doc_id", "n_tokens", "shard", 0L)
    }
  }

  test("spanCorruption pairs are invertible: substituting targets back reconstructs the text") {
    val texts = (0 until 25).map(i =>
      (i.toLong, (1 to (5 + i)).map(t => s"w${i}_$t").mkString(" ")))
    val docs = texts.toDF("doc_id", "text")
    val out = Packing.spanCorruption(docs, "text", "doc_id",
      spanLen = 3, corruptEvery = 5).collect()
    assert(out.length == 25)
    val orig = texts.toMap
    var totalMasked = 0L
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val input = r.getAs[String]("input_text")
      val target = r.getAs[String]("target_text")
      val n = r.getAs[Long]("n_masked")
      totalMasked += n
      assert("<extra_id_".r.findAllIn(input).size == n)
      // target = "<extra_id_0> tok tok <extra_id_1> tok ..."; split it
      // back into (sentinel -> span) and substitute into the input.
      var rebuilt = input
      if (n > 0) {
        val parts = target.split("(?=<extra_id_)").filter(_.nonEmpty)
        assert(parts.length == n)
        parts.foreach { p =>
          val sentinel = p.substring(0, p.indexOf('>') + 1)
          val span = p.substring(p.indexOf('>') + 1).trim
          rebuilt = rebuilt.replace(sentinel, span)
        }
      }
      assert(rebuilt == orig(id), s"doc $id failed to reconstruct")
    }
    // the deterministic hash masks a nontrivial share of spans overall
    assert(totalMasked > 0)
  }

  test("mlmMask: token-count preserved, labels align with changed positions, pure projection") {
    val texts = (0 until 40).map(i =>
      (i.toLong, (1 to (10 + i)).map(t => s"tok${i}_$t").mkString(" ")))
    val docs = texts.toDF("doc_id", "text")
    val plan = Packing.mlmMask(docs, "text", "doc_id")
    // the scale contract: a pure projection — no explode, no window, no join
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, Window => LW}
    val opt = plan.queryExecution.optimizedPlan
    assert(opt.collect { case g: Generate => g }.isEmpty)
    assert(opt.collect { case j: Join => j }.isEmpty)
    assert(opt.collect { case w: LW => w }.isEmpty)
    val orig = texts.toMap
    var selected = 0L; var tokens = 0L
    plan.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val in = r.getAs[String]("input_text").split(" ")
      val ot = orig(id).split(" ")
      assert(in.length == ot.length, s"doc $id changed token count")
      tokens += ot.length
      val labels = r.getAs[String]("labels")
      val labelPos = if (labels.isEmpty) Set.empty[Int]
        else labels.split(" ").map { p =>
          val Array(pos, tok) = p.split(":", 2)
          assert(ot(pos.toInt) == tok, s"label records wrong original at $pos")
          pos.toInt
        }.toSet
      selected += labelPos.size
      // every changed position must be a selected one (keep-class
      // positions are selected but unchanged)
      in.zip(ot).zipWithIndex.foreach { case ((a, b), i) =>
        if (a != b) assert(labelPos.contains(i), s"doc $id pos $i changed unselected")
      }
      assert(r.getAs[Long]("n_masked") + r.getAs[Long]("n_random") +
        r.getAs[Long]("n_kept") == labelPos.size)
      assert(in.count(_ == "[MASK]") == r.getAs[Long]("n_masked"))
    }
    val rate = selected.toDouble / tokens
    assert(rate > 0.10 && rate < 0.20, s"selection rate $rate outside ~15% band")
  }

  test("ictPairs: anchor+positive reconstruct the document; negatives are other docs") {
    val texts = (0 until 60).map(i =>
      (i.toLong, (1 to (4 + i % 7)).map(t => s"w${i}_$t").mkString(" ")))
    val docs = texts.toDF("doc_id", "text")
    val rows = Packing.ictPairs(docs, "text", "doc_id", numBuckets = 8).collect()
    assert(rows.length == 60)
    val orig = texts.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val joined = (r.getAs[String]("anchor") + " " + r.getAs[String]("positive")).trim
      assert(joined == orig(id), s"doc $id split is not a partition of the text")
      // 60 docs over 8 buckets: no singleton buckets, so the in-batch
      // negative is always a DIFFERENT document
      assert(r.getAs[Long]("neg_doc_id") != id)
      assert(orig.contains(r.getAs[Long]("neg_doc_id")))
    }
  }

  test("spanCorruption rejects degenerate parameters") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.spanCorruption(docs, "text", "doc_id", spanLen = 0)
    }
    intercept[IllegalArgumentException] {
      Packing.spanCorruption(docs, "text", "doc_id", corruptEvery = 1)
    }
  }

  test("preferencePairs: argmax/argmin with id tie-breaks, degenerate groups dropped") {
    import spark.implicits._
    val docs = Seq(
      ("A", 1L, 5.0), ("A", 2L, 9.0), ("A", 3L, 9.0), ("A", 4L, 5.0),
      ("B", 5L, 7.0),              // singleton → dropped
      ("C", 6L, 3.0), ("C", 7L, 3.0) // all-equal scores → ids break the tie
    ).toDF("src", "id", "sc")
    val got = Packing.preferencePairs(docs, "src", "id", col("sc"))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // A: chosen = lowest id among the 9.0 ties (2), rejected = lowest id
    // among the 5.0 ties (1)
    assert(got(0) == (("A", 2L, 9.0, 1L, 5.0, 4.0)))
    // B is a singleton; C's scores all tie so chosen and rejected both
    // resolve to id 6 — both groups must be dropped, leaving only A
    assert(got.length == 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent single-process reference: greedy-left merge + exact
    * recount, mirroring the classic BPE trainer loop. */
  private def referenceTrain(corpus: Seq[String], rounds: Int, minCount: Long,
      joiner: String): (Seq[(String, String, Long)], Seq[String]) = {
    var docs = corpus.map(_.split(" ", -1).toSeq)
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val counts = docs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
      val best = counts.toSeq
        .sortBy { case ((l2, r2), n) => (-n, l2, r2) }.headOption
      best match {
        case Some(((l, rr), n)) if n >= minCount =>
          merges += ((l, rr, n))
          docs = docs.map { t =>
            val out = Seq.newBuilder[String]
            var i = 0
            while (i < t.length) {
              if (i + 1 < t.length && t(i) == l && t(i + 1) == rr) {
                out += l + joiner + rr; i += 2
              } else { out += t(i); i += 1 }
            }
            out.result()
          }
          r += 1
        case _ => done = true
      }
    }
    (merges.result(), docs.map(_.mkString(" ")))
  }

  test("train matches the reference implementation, including greedy overlap") {
    val corpus = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "a a a a a",                       // overlap: greedy-left pairs
      "the cat sat",
      "")
    val (wantMerges, wantCorpus) =
      referenceTrain(corpus, rounds = 5, minCount = 2, joiner = "")
    val res = BpeTrainer.train(
      corpus.toDF("text").repartition(3), "text", rounds = 5, joiner = "")
    assert(res.merges.map(m => (m.left, m.right, m.pairCount)) == wantMerges)
    assert(res.merges.map(_.round) == res.merges.indices)
    assert(res.corpus.select("text").as[String].collect().sorted.toSeq
      == wantCorpus.sorted)
    // first merge is (a,a): 4 overlapping occurrences in "a a a a a"
    // beat (the,cat)'s 3 — and the merge then applies greedy-left,
    // fusing non-overlapping pairs only: "aa aa a"
    assert(res.merges.head.left == "a" && res.merges.head.right == "a"
      && res.merges.head.pairCount == 4)
    assert((res.merges(1).left, res.merges(1).right) == ("the", "cat"))
    assert(res.corpus.select("text").as[String].collect()
      .exists(t => t == "aa aa a" || t.startsWith("aaaa") || t.contains("aa")))
  }

  test("applyMerges encodes held-out text with the frozen vocabulary") {
    val res = BpeTrainer.train(
      Seq("new york city", "new york state", "new york city hall")
        .toDF("text"), "text", rounds = 2, joiner = "")
    assert(res.merges.map(m => (m.left, m.right)) ==
      Seq(("new", "york"), ("newyork", "city")))
    // held-out doc: both rules apply in training order
    val held = BpeTrainer.applyMerges(
      Seq("visit new york city today", "old york city").toDF("text"),
      "text", res.merges, joiner = "")
      .orderBy("text").collect().map(_.getString(0)).toSeq
    // "old york city": no "new york" → second rule ("newyork","city")
    // does not fire either — merges are token-exact, not substring
    assert(held == Seq("old york city", "visit newyorkcity today"))
    // checkpointed variant is identical
    val held2 = BpeTrainer.applyMergesCheckpointed(
      Seq("visit new york city today", "old york city").toDF("text"),
      "text", res.merges, joiner = "", batch = 1)
      .orderBy("text").collect().map(_.getString(0)).toSeq
    assert(held2 == held)
  }

  test("batch promotion: equals sequential when top pairs are symbol-disjoint") {
    // Four pair families with disjoint symbols and strictly decreasing
    // counts; merged symbols create no new pairs (each doc is one pair),
    // so batch promotion must equal single-promotion exactly.
    val corpus =
      Seq.fill(10)("a b") ++ Seq.fill(8)("c d") ++
      Seq.fill(6)("e f") ++ Seq.fill(4)("g h")
    val seqRes = BpeTrainer.train(corpus.toDF("text").repartition(3),
      "text", rounds = 4, joiner = "")
    val batRes = BpeTrainer.train(corpus.toDF("text").repartition(3),
      "text", rounds = 4, joiner = "", batchSize = 4)
    assert(batRes.merges == seqRes.merges)
    assert(batRes.merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L), ("g", "h", 4L)))
    assert(batRes.corpus.select("text").as[String].collect().sorted.toSeq
      == seqRes.corpus.select("text").as[String].collect().sorted.toSeq)
  }

  test("batch promotion: shared-symbol candidate is deferred, not promoted stale") {
    // (x,y) count 5 outranks (y,z) count 4, and merging (x,y) DESTROYS
    // every (y,z) occurrence ("x y z" -> "xy z"). A naive batch would
    // promote (y,z) with its stale count; deferral must instead recount
    // and promote (xy,z) — exactly what sequential promotion does.
    val corpus = Seq.fill(4)("x y z") ++ Seq.fill(1)("x y")
    val seqRes = BpeTrainer.train(corpus.toDF("text"), "text",
      rounds = 2, joiner = "")
    val batRes = BpeTrainer.train(corpus.toDF("text"), "text",
      rounds = 2, joiner = "", batchSize = 4)
    assert(batRes.merges == seqRes.merges)
    assert(batRes.merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("x", "y", 5L), ("xy", "z", 4L)))
    assert(batRes.corpus.select("text").as[String].collect().sorted.toSeq
      == Seq("xy", "xyz", "xyz", "xyz", "xyz"))
  }

  test("train result carries its joiner; applyMerges(result) round-trips") {
    // default joiner (U+0001): inference through the Result overload
    // must reproduce the training-corpus encoding on the same text —
    // the round-8 advice scenario (mismatched joiner between train and
    // apply silently no-ops later rules).
    val docs = Seq("new york city", "new york state", "new york city hall")
    val res = BpeTrainer.train(docs.toDF("text"), "text", rounds = 2)
    assert(res.joiner == "\u0001")
    val applied = BpeTrainer.applyMerges(docs.toDF("text"), "text", res)
      .select("text").as[String].collect().sorted.toSeq
    val trained = res.corpus.select("text").as[String].collect().sorted.toSeq
    assert(applied == trained)
    // second rule references the fused first symbol and DID fire
    assert(res.merges(1).left == "new\u0001york")
    assert(applied.exists(_.contains("new\u0001york\u0001city")))
  }

  test("train stops when no pair reaches minCount, and joiner='' concatenates") {
    val res = BpeTrainer.train(
      Seq("x y", "p q").toDF("text"), "text", rounds = 10, joiner = "")
    assert(res.merges.isEmpty) // every pair occurs once < minCount=2
    val res2 = BpeTrainer.train(
      Seq("x y", "x y z").toDF("text"), "text", rounds = 10, joiner = "")
    assert(res2.merges.map(_.merged) == Seq("xy"))
    assert(res2.corpus.select("text").as[String].collect().sorted.toSeq
      == Seq("xy", "xy z"))
  }
}

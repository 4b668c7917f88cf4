package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** The one-call curation chain: exact dups collapse, LSH near-dups
  * collapse to the min id, boilerplate fails the quality panel. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("curate chains exact dedup, near-dup removal, and quality filtering") {
    import spark.implicits._
    val proseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val proseB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, proseA),                                  // keeper (rep of {1,2})
      (2L, proseA),                                  // exact dup → dropped
      (3L, proseB + " tailone"),                     // near-dup keeper of {3,4}
      (4L, proseB + " tailtwo"),                     // near-dup → dropped
      (5L, Seq.fill(15)("buy now").mkString(" ")))   // boilerplate → quality-dropped
      .toDF("doc_id", "text")
    // Relaxed thresholds except repetition: this corpus is synthetic, so
    // only the top-bigram fraction is meant to fire (doc 5's "buy now"
    // bigram is >50% of its bigrams).
    val out = Curation.curate(docs, "text", "doc_id",
        thresholds = Curation.QualityThresholds(
          minTokens = 5, minTtr = 0.2, minStopwordRatio = 0.0,
          maxTopBigramFrac = 0.5, maxRareFrac = 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("curate with an inert filter keeps every distinct document") {
    import spark.implicits._
    val docs = Seq(
      (10L, "one two three four five six"),
      (11L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val out = Curation.curate(docs, "text", "doc_id",
        thresholds = Curation.QualityThresholds(
          minTokens = 0, minTtr = 0.0, minStopwordRatio = 0.0,
          maxTopBigramFrac = 2.0, maxRareFrac = 1.0))
      .count()
    assert(out == 2L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merged partials equal the direct aggregate, regardless of split") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val direct = IncrementalAgg.partial(rows, Seq("k"), "v")
      .orderBy("k").collect().map(_.toString)

    // three arbitrary disjoint batches
    val parts = Seq(
      rows.filter(col("v") % 3 === 0), rows.filter(col("v") % 3 === 1),
      rows.filter(col("v") % 3 === 2))
      .map(b => IncrementalAgg.partial(b, Seq("k"), "v"))
    val merged = IncrementalAgg.mergePartials(parts, Seq("k"))
      .orderBy("k").collect().map(_.toString)
    assert(merged.toSeq == direct.toSeq)
  }

  test("distinct-sketch partials: merged sketch equals the whole-history sketch exactly") {
    import spark.implicits._
    val k = 16
    // 3 batches, overlapping users per key — distinct does NOT add
    val rows = (1 to 300).map(i => (s"k${i % 2}", i.toLong, s"u${i % 43}"))
      .toDF("k", "v", "u")
    val batches = Seq(0, 1, 2).map(m => rows.filter(col("v") % 3 === m))
    val parts = batches.map(b =>
      IncrementalAgg.partialWithDistinct(b, Seq("k"), "v", "u", k))
    val merged = IncrementalAgg.mergePartialsWithDistinct(parts, Seq("k"), k)
    val whole = IncrementalAgg.partialWithDistinct(rows, Seq("k"), "v", "u", k)
    // sketch arrays (and every additive measure) must be bit-identical
    // to the single-pass aggregate over the concatenated history
    assert(merged.orderBy("k").collect().map(_.toString).toSeq
      == whole.orderBy("k").collect().map(_.toString).toSeq)
    // and the read-out estimate is exact here: 43 distinct... capped by
    // k=16 minima → estimated; verify it lands near 43
    val est = IncrementalAgg.estimateDistinct(merged, k)
      .select("k", "est_distinct").orderBy("k").collect()
    est.foreach(r => assert(math.abs(r.getDouble(1) - 43.0) / 43.0 < 0.6,
      s"estimate ${r.getDouble(1)} too far from 43"))
  }

  test("mergePartials is associative: (a+b)+c == a+(b+c)") {
    import spark.implicits._
    val rows = (1 to 60).map(i => (s"k${i % 2}", i.toLong)).toDF("k", "v")
    val Seq(a, b, c) = Seq(0, 1, 2).map(m =>
      IncrementalAgg.partial(rows.filter(col("v") % 3 === m), Seq("k"), "v"))
    val left = IncrementalAgg.mergePartials(
      Seq(IncrementalAgg.mergePartials(Seq(a, b), Seq("k")), c), Seq("k"))
      .orderBy("k").collect().map(_.toString)
    val right = IncrementalAgg.mergePartials(
      Seq(a, IncrementalAgg.mergePartials(Seq(b, c), Seq("k"))), Seq("k"))
      .orderBy("k").collect().map(_.toString)
    assert(left.toSeq == right.toSeq)
  }

  test("refreshJoinView: delta refresh equals full recompute") {
    import spark.implicits._
    val dim = Seq((1L, "r1"), (2L, "r2"), (3L, "r1")).toDF("dk", "grp")
    val fact = (1 to 40)
      .map(i => (i.toLong, (i % 3 + 1).toLong, (i * 10).toLong))
      .toDF("fk", "dref", "m")
    val base = fact.filter(col("fk") % 4 =!= 0)
    val delta = fact.filter(col("fk") % 4 === 0)
    val view = IncrementalAgg.partial(
      base.join(dim, col("dref") === col("dk")), Seq("grp"), "m")
    val refreshed = IncrementalAgg.refreshJoinView(view, delta, dim,
      "dref", "dk", "grp", "m").orderBy("grp").collect().map(_.toString)
    val full = IncrementalAgg.partial(
      fact.join(dim, col("dref") === col("dk")), Seq("grp"), "m")
      .orderBy("grp").collect().map(_.toString)
    assert(refreshed.toSeq == full.toSeq)
    // a delta touching only one group leaves the others' rows unchanged
    val oneGroup = delta.filter(col("dref") === 1L)
    val part = IncrementalAgg.refreshJoinView(view, oneGroup, dim,
      "dref", "dk", "grp", "m").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = view.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dk=2 -> grp r2 is untouched by a dref=1 delta
    assert(part("r2") == before("r2"))
    assert(part("r1") > before("r1"))
  }

  test("signed view: delete + update deltas equal final-state recompute") {
    import spark.implicits._
    val dim = Seq((1L, "g1"), (2L, "g2")).toDF("dk", "grp")
    val fact = (1 to 20)
      .map(i => (i.toLong, (i % 2 + 1).toLong, i.toLong * 100))
      .toDF("fk", "dref", "m")
    val view = IncrementalAgg.signedPartial(
      fact.withColumn("sign", lit(1L))
        .join(dim, col("dref") === col("dk")), Seq("grp"), "m", col("sign"))
    // delete fk%5==0; update fk==1 to m+7 (retract+insert)
    val del = fact.filter(col("fk") % 5 === 0).withColumn("sign", lit(-1L))
    val upOld = fact.filter(col("fk") === 1).withColumn("sign", lit(-1L))
    val upNew = upOld.withColumn("m", col("m") + 7L)
      .withColumn("sign", lit(1L))
    val delta = del.unionByName(upOld).unionByName(upNew)
    val refreshed = IncrementalAgg.refreshSignedJoinView(view, delta, dim,
      "dref", "dk", "grp", "m", col("sign"))
      .orderBy("grp").collect().map(_.toString)
    val finalFact = fact.filter(col("fk") % 5 =!= 0)
      .withColumn("m", when(col("fk") === 1, col("m") + 7L)
        .otherwise(col("m")))
    val full = IncrementalAgg.signedPartial(
      finalFact.withColumn("sign", lit(1L))
        .join(dim, col("dref") === col("dk")), Seq("grp"), "m", col("sign"))
      .orderBy("grp").collect().map(_.toString)
    assert(refreshed.toSeq == full.toSeq)
    // retracting an entire group removes its row
    val small = Seq((1L, 1L, 10L)).toDF("fk", "dref", "m")
    val v = IncrementalAgg.signedPartial(
      small.withColumn("sign", lit(1L))
        .join(dim, col("dref") === col("dk")), Seq("grp"), "m", col("sign"))
    val gone = IncrementalAgg.refreshSignedJoinView(v,
      small.withColumn("sign", lit(-1L)), dim,
      "dref", "dk", "grp", "m", col("sign"))
    assert(gone.count() == 0)
    // an unbalanced stream (n=0, sum!=0) fails fast
    val bad = small.withColumn("m", col("m") + 1L)
      .withColumn("sign", lit(-1L))
    val ex = intercept[Exception] {
      IncrementalAgg.refreshSignedJoinView(v, bad, dim,
        "dref", "dk", "grp", "m", col("sign")).collect()
    }
    assert(ex.getMessage.contains("unbalanced") ||
      Option(ex.getCause).exists(_.getMessage.contains("unbalanced")))
  }
}

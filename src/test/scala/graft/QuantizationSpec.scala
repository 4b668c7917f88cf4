package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantization, Similarity}

/** Vector-compression contracts: int8 codes must reconstruct within the
  * quantization step, PQ must encode centroid vectors losslessly, ADC
  * search must equal the distance to the reconstruction it claims to
  * approximate, and incremental IVF append must equal a fresh full
  * build over the same centroids (the no-special-casing guarantee the
  * scaladoc sells). */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int, d: Int = 8): Seq[Double] =
    (0 until d).map(j => math.sin(seed * 7 + j * 3 + 1) * (1 + j % 3))
  private lazy val corpus = (0 until 40).map(i => (i.toLong, vec(i), i % 4))
    .toDF("id", "emb", "label")

  test("int8 codes are in [0,255] and dequantize within scale/2 per element") {
    val q = Quantization.quantizeInt8(corpus, "emb", "id")
      .withColumn("vq", Quantization.dequantInt8(col("codes"), col("vmin"), col("scale")))
    val rows = q.join(corpus.select(col("id"), col("emb")), "id").collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.forall(c => c >= 0 && c <= 255))
      val scale = r.getAs[Double]("scale")
      val orig = r.getSeq[Double](r.fieldIndex("emb"))
      val rec = r.getSeq[Double](r.fieldIndex("vq"))
      orig.zip(rec).foreach { case (x, xr) =>
        assert(math.abs(x - xr) <= scale / 2 + 1e-12,
          s"|$x - $xr| > scale/2 = ${scale / 2}")
      }
    }
  }

  test("constant vector: zero scale, all-zero codes, exact reconstruction") {
    val const = Seq((1L, Seq(2.5, 2.5, 2.5))).toDF("id", "emb")
    val r = Quantization.quantizeInt8(const, "emb", "id")
      .withColumn("vq", Quantization.dequantInt8(col("codes"), col("vmin"), col("scale")))
      .head()
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getSeq[Int](r.fieldIndex("codes")).forall(_ == 0))
    assert(r.getSeq[Double](r.fieldIndex("vq")) == Seq(2.5, 2.5, 2.5))
  }

  test("int8Audit: near-perfect cosine, tiny MSE, one row per label") {
    val audit = Quantization.int8Audit(corpus, "emb", "id", "label").collect()
    assert(audit.length == 4)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 10)
      assert(r.getAs[Double]("avg_cosine") > 0.999)
      assert(r.getAs[Double]("avg_mse") < 1e-3)
      assert(r.getAs[Double]("avg_range") > 0)
    }
  }

  test("pqAssign encodes codebook vectors losslessly (dist2 = 0, own code)") {
    val cb = Quantization.pqCodebook(corpus, "emb", "id", m = 4, ksub = 8)
    val assigned = Quantization.pqAssign(corpus, "emb", "id", cb, m = 4)
    assert(assigned.count() == 40 * 4)
    // A vector that IS centroid i must land on a zero-distortion cell
    // (possibly a duplicate centroid's id, never a worse one).
    val own = assigned.filter(col("id") < 8)
    assert(own.filter(col("dist2") =!= 0.0).count() == 0)
  }

  test("pq fails fast when dim is not divisible by m") {
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "emb")
    val cb = Quantization.pqCodebook(corpus, "emb", "id", m = 4, ksub = 8)
    val ex = intercept[Exception] {
      Quantization.pqAssign(bad, "emb", "id", cb, m = 4).collect()
    }
    assert(ex.getMessage.contains("not divisible") ||
      Option(ex.getCause).exists(_.getMessage.contains("not divisible")))
  }

  test("ADC distance equals exact distance to the PQ reconstruction") {
    val m = 4
    val cb = Quantization.pqCodebook(corpus, "emb", "id", m = m, ksub = 8)
    val codes = Quantization.pqAssign(corpus, "emb", "id", cb, m = m)
      .select(col("id"), col("subspace"), col("code"))
    val queries = corpus.filter(col("id") < 2)
    val adc = Quantization.pqSearchAdc(codes, cb, queries, "emb", "id",
      m = m, k = 40)
    // Reference: reconstruct each corpus vector from its codes and score
    // ||q - rec||^2 per (query, neighbor) with the same per-subspace
    // 6-dp rounding, summed exactly.
    val cbRows = cb.collect().map(r =>
      (r.getAs[Int]("subspace"), r.getAs[Long]("cent")) ->
        r.getSeq[Double](r.fieldIndex("cv"))).toMap
    val codeRows = codes.collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("subspace"))
        .map(r => (r.getAs[Int]("subspace"), r.getAs[Long]("code")))).toMap
    val vecs = corpus.collect().map(r =>
      r.getAs[Long]("id") -> r.getSeq[Double](r.fieldIndex("emb"))).toMap
    def expected(q: Long, x: Long): BigDecimal =
      codeRows(x).map { case (ss, code) =>
        val qs = vecs(q).slice(ss * 2, ss * 2 + 2)
        val cv = cbRows((ss, code))
        val comp = qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        BigDecimal(comp).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    adc.collect().foreach { r =>
      val e = expected(r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      // Tolerance: the operator folds dqq-2dqc+dcc while the reference
      // zips (a-b)^2 — equal in R, ~1e-16 apart in IEEE, so a component
      // sitting ON a .5e-6 rounding boundary may round apart by 1e-6.
      assert(math.abs(r.getAs[Double]("adc_dist") - e.toDouble) < 2.1e-6,
        s"adc ${r.getAs[Double]("adc_dist")} != reconstruction dist $e")
    }
  }

  test("pqCodebookRefined never increases total distortion; 3 iterations run flat") {
    def totalDistortion(cb: org.apache.spark.sql.DataFrame): Double =
      Quantization.pqAssign(corpus, "emb", "id", cb, m = 4)
        .agg(sum(col("dist2"))).head().getDouble(0)
    val seed = Quantization.pqCodebook(corpus, "emb", "id", m = 4, ksub = 8)
    val r1 = Quantization.pqCodebookRefined(corpus, "emb", "id",
      m = 4, ksub = 8, iterations = 1)
    val r3 = Quantization.pqCodebookRefined(corpus, "emb", "id",
      m = 4, ksub = 8, iterations = 3)
    val (d0, d1, d3) = (totalDistortion(seed), totalDistortion(r1), totalDistortion(r3))
    // Lloyd steps are non-increasing in distortion (up to the 6-dp
    // rounding the determinism contract imposes).
    assert(d1 <= d0 + 1e-4, s"1 iteration worsened distortion: $d0 -> $d1")
    assert(d3 <= d1 + 1e-4, s"3 iterations worsened distortion: $d1 -> $d3")
    assert(r3.count() == 4 * 8)
  }

  test("bruteForceL2TopK rank-1 is the true nearest by squared L2") {
    val queries = corpus.filter(col("id") < 2)
    val top = Similarity.bruteForceL2TopK(corpus, queries, "emb", "id", k = 1)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist2"))).toMap
    val vecs = corpus.collect().map(r =>
      r.getAs[Long]("id") -> r.getSeq[Double](r.fieldIndex("emb"))).toMap
    for (q <- Seq(0L, 1L)) {
      val best = vecs.filter(_._1 != q).map { case (i, v) =>
        (i, v.zip(vecs(q)).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.minBy { case (i, d) => (BigDecimal(d).setScale(6,
        BigDecimal.RoundingMode.HALF_UP), i) }
      assert(top(q)._1 == best._1)
      assert(math.abs(top(q)._2 - best._2) < 1e-5)
    }
  }

  test("dmean aborts loudly when a value overflows the quantization range") {
    // |v| >= 1e6 overflows DECIMAL(18,12): must abort loudly, never
    // silently drop the row from the numerator while counting it in the
    // denominator. Under ANSI mode (the Spark 4 default) the decimal
    // cast itself throws; under ansi=false the cast nulls out and
    // dmean's own overflow guard raises instead — either way, loud.
    val df = Seq(0.5, 2.0e7).toDF("x")
    val ex = intercept[Exception] {
      df.agg(graft.functions.Decimals.dmean(col("x"), 12)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && (m.contains("quantization range")
      || m.contains("cannot be represented"))))
    // in-range values are unaffected
    val ok = Seq(0.25, 0.75).toDF("x")
      .agg(graft.functions.Decimals.dmean(col("x"), 12)).head().getDouble(0)
    assert(ok == 0.5)
  }

  test("ivfAppend equals a fresh full build over the same centroids") {
    val base = corpus.filter(col("id") % 3 =!= 0)
    val delta = corpus.filter(col("id") % 3 === 0)
    val idx = Similarity.buildIvfIndex(base, "emb", "id", nlist = 6)
    val appended = Similarity.ivfAppend(idx, delta, "emb", "id")
    val fresh = Similarity.buildIvfIndex(corpus, "emb", "id", nlist = 6,
      centroids = Some(idx.centroids))
    val a = appended.entries.select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = fresh.entries.select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == f)
    assert(a.size == 40)
  }

  test("randomProject: deterministic signs, JL distortion bounded on seeded vectors") {
    import spark.implicits._
    val signs = Quantization.projectionSigns(32, 16)
    assert(signs == Quantization.projectionSigns(32, 16))
    assert(signs.size == 16 && signs.forall(_.size == 32))
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    // both signs occur (an all-ones matrix would be a broken generator)
    assert(signs.flatten.distinct.size == 2)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(32)(rnd.nextGaussian()))).toDF("id", "v")
    val proj = Quantization.randomProject(vecs, "v", signs, "p")
      .select(col("id"), col("v"), col("p")).collect()
      .map(r => (r.getSeq[Double](1), r.getSeq[Double](2)))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val errs = for {
      i <- proj.indices; j <- proj.indices if i < j
    } yield math.abs(cos(proj(i)._1, proj(j)._1) - cos(proj(i)._2, proj(j)._2))
    // 32→16 halves the dimension; mean cosine distortion on gaussian
    // vectors concentrates well under 0.25 (JL with ±1 entries)
    assert(errs.sum / errs.size < 0.25,
      s"mean distortion ${errs.sum / errs.size} too high")
    assert(proj.forall(_._2.size == 16))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-function registration via SparkSessionExtensions
  * (spark.sql.extensions=graft.GraftExtensions, set in TestSpark). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot is callable from SQL and matches the manual sum") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 1.0 * 4 + 2 * 5 + 3 * 6)
  }

  test("graft_min_gram_md5 from SQL equals md5 of the min gram computed by hand") {
    // text shorter than gram → single truncated gram = whole text
    val whole = spark.sql("SELECT graft_min_gram_md5('abc', 16) AS f, md5('abc') AS m")
      .collect().head
    assert(whole.getString(0) == whole.getString(1))
    // 'abcd', gram 3 → grams {abc, bcd}; expect min(md5) over both
    val r = spark.sql(
      "SELECT graft_min_gram_md5('abcd', 3) AS f, least(md5('abc'), md5('bcd')) AS m")
      .collect().head
    assert(r.getString(0) == r.getString(1))
  }

  // Literal arrays constant-fold, and Seq.toDF LocalRelations are
  // evaluated whole by ConvertToLocalRelation — the fixture must be
  // RDD-backed for any optimizer rewrite to be observable.
  private def vecs() = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val at = ArrayType(DoubleType, containsNull = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(1.0, 2.0), Seq(3.0, 4.0))), 1),
      StructType(Seq(StructField("a", at), StructField("b", at))))
  }

  test("graft_count_in_set is callable from SQL and counts duplicate hits") {
    val spark = TestSpark.spark
    val got = spark.sql(
      "SELECT graft_count_in_set(array('the','the','cat'), array('the','and')) AS n")
      .collect().head.getLong(0)
    assert(got == 2L)
  }

  test("optimizer rule rewrites the naive HOF dot product to graft_dot") {
    vecs().createOrReplaceTempView("vecs_t")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |                 CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d
        |FROM vecs_t""".stripMargin)
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dot"), s"rule did not fire:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF survived:\n$plan")
    assert(df.collect().head.getDouble(0) == 11.0)
  }

  test("dot-product rule leaves non-matching aggregates alone") {
    vecs().createOrReplaceTempView("vecs_t2")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y),
        |                 CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d
        |FROM vecs_t2""".stripMargin)
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_dot"), s"rule misfired:\n$plan")
    assert(df.collect().head.getDouble(0) == 10.0) // sum of pairwise sums
  }

  test("graft_count_in_set rejects a non-string array at analysis") {
    // Without the ExpectsInputTypes gate this reached execution, where
    // UnsafeArrayData.getUTF8String reinterpreted int slots as garbage.
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_count_in_set(array(1, 2, 3), array('the','and'))").collect()
    }
    val m = e.getMessage.toLowerCase
    assert(m.contains("type") || m.contains("cannot resolve"), e.getMessage)
  }

  test("graft_min_gram_md5 rejects a non-literal gram") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_min_gram_md5('abc', length('xx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("graft_bloom_agg / graft_might_contain round-trip in SQL") {
    // Build a sketch over a 3-element set via the scalar-subquery form
    // (the same shape Spark's injected runtime filter uses) and probe:
    // members must hit; a Bloom filter has NO false negatives, so the
    // member assertions are exact. The non-member probe documents the
    // <1% fpp at 10 bits/element rather than asserting (a false positive
    // is legal).
    val out = spark.sql(
      """WITH s(x) AS (VALUES ('alpha'), ('beta'), ('gamma')),
        |b AS (SELECT graft_bloom_agg(xxhash64(x), 100L, 1000L) AS bf FROM s)
        |SELECT
        |  graft_might_contain((SELECT bf FROM b), xxhash64('alpha')) AS hit1,
        |  graft_might_contain((SELECT bf FROM b), xxhash64('gamma')) AS hit2
        |""".stripMargin).collect().head
    assert(out.getBoolean(0) && out.getBoolean(1))
  }

  test("round-9 expressions are SQL-callable and agree with their Column-API forms") {
    // graft_token_tf: per-document term-frequency map
    val tf = spark.sql("SELECT graft_token_tf('a b a c b a') AS m")
      .collect().head.getMap[String, Int](0)
    assert(tf == Map("a" -> 3, "b" -> 2, "c" -> 1))
    // graft_nfc: decomposed e + combining acute normalizes to é
    val nfc = spark.sql("SELECT graft_nfc('é') AS s").collect().head.getString(0)
    assert(nfc == "é")
    // graft_cdc_chunks: deterministic, concatenation of chunks = input
    val chunks = spark.sql("SELECT graft_cdc_chunks('the quick brown fox jumps over the lazy dog', 8, 2) AS c")
      .collect().head.getSeq[String](0)
    assert(chunks.mkString("") == "the quick brown fox jumps over the lazy dog")
    // graft_kmv + graft_kmv_merge: sketch of a split stream merges to the
    // whole-stream sketch (the k-minima union law)
    val kmv = spark.sql(
      """WITH s(x, half) AS (VALUES ('a', 0), ('b', 0), ('c', 1), ('d', 1), ('a', 1)),
        |whole AS (SELECT graft_kmv(x, 3) AS mins FROM s),
        |parts AS (SELECT graft_kmv(x, 3) AS mins FROM s GROUP BY half),
        |merged AS (SELECT graft_kmv_merge(mins, 3) AS mins FROM parts)
        |SELECT (SELECT mins FROM whole) = (SELECT mins FROM merged) AS same
        |""".stripMargin).collect().head.getBoolean(0)
    assert(kmv)
    // graft_misra_gries: the heavy key survives the k-bounded summary
    val mg = spark.sql(
      """WITH s(x) AS (VALUES ('hot'),('hot'),('hot'),('hot'),('a'),('b'),('c'))
        |SELECT graft_misra_gries(x, 2) AS cand FROM s""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(mg.contains("hot"))
  }
}

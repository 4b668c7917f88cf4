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

  test("graft_min_gram_md5 rejects a non-literal gram") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_min_gram_md5('abc', length('xx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}

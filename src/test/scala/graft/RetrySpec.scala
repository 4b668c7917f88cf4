package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** S2: bounded retry with linearly growing backoff
  * (rqtradein_etl.py:211-227). */
class RetrySpec extends AnyFunSuite {

  test("returns first success without sleeping") {
    var sleeps = List.empty[Long]
    val got = Retry.withBackoff(sleep = sleeps :+= _)(42)
    assert(got == 42 && sleeps.isEmpty)
  }

  test("retries with linear backoff, then succeeds") {
    var sleeps = List.empty[Long]
    var calls = 0
    val got = Retry.withBackoff(maxRetries = 3, backoffMillis = 5, sleep = sleeps :+= _) {
      calls += 1
      if (calls < 3) sys.error(s"boom $calls")
      "ok"
    }
    assert(got == "ok" && calls == 3 && sleeps == List(5L, 10L))
  }

  test("rethrows the final failure after maxRetries attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 3, backoffMillis = 1, sleep = _ => ()) {
        calls += 1; sys.error(s"boom $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "boom 3")
  }

  test("PagedSource drains pages until the first empty page, lazily unioned") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    var calls = 0
    val src = new graft.sources.PagedSource((s, _, i) => {
      calls += 1
      if (i <= 3) Seq.tabulate(2)(j => (i * 10 + j)).toDF("v")
      else Seq.empty[Int].toDF("v")
    })
    val out = src.fetch(spark, Map.empty)
    assert(out.count() == 6)
    assert(out.select(min(col("v")), max(col("v"))).as[(Int, Int)].head() == ((10, 31)))
    assert(calls == 4) // 3 full pages + the terminating empty page only
  }

  test("PagedSource with an immediately empty page yields an empty frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val src = new graft.sources.PagedSource((_, _, _) => Seq.empty[Int].toDF("v"))
    assert(src.fetch(spark, Map.empty).isEmpty)
  }
}
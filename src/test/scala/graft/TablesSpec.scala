package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Sessionize}
import graft.sources.Tables

/** Corpus-drift canary: the driver has regenerated `events.ts` under three
  * different parquet encodings across rounds (INT64 epoch-nanos read as
  * LongType under nanosAsLong, TIMESTAMP_NTZ micros, plain TIMESTAMP
  * micros). Round 6 shipped with only two of the three handled and lost 3
  * queries to DATATYPE_MISMATCH at every scale factor. This spec writes a
  * tiny fixture in each historical encoding and pins the [[Tables.load]]
  * contract: `events.ts` is ALWAYS surfaced as TimestampType with the
  * same instant values, whatever the generator shipped. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // One instant with sub-second precision, exercised in all encodings.
  private val instants = Seq(
    "2024-01-01 10:00:00.123456", "2024-06-15 23:59:59.999999")
  private def micros(s: String): Long = {
    val t = Timestamp.valueOf(s)
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L
  }

  /** Writes `events.parquet` under a fresh dir and loads it via Tables. */
  private def loadFixture(write: String => Unit): DataFrame = {
    val dir = Files.createTempDirectory("graft-events").toString
    write(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  private def assertContract(df: DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == instants.map(micros).sorted)
  }

  test("load surfaces INT64-nanos events.ts as TimestampType") {
    // Parquet TIMESTAMP(NANOS) surfaces as LongType under the repo's
    // nanosAsLong conf — identically to a plain INT64 column, which Spark
    // CAN write, so the fixture is faithful at the level load() sees.
    import spark.implicits._
    assertContract(loadFixture { path =>
      instants.map(s => micros(s) * 1000L).toDF("ts").write.parquet(path)
    })
  }

  test("INT64 probe survives leading NULLs and sentinel outliers") {
    // head(1)-style probes would throw on a leading null ts and would
    // misclassify a nanos file whose first row is a ts=0 sentinel; the
    // max(abs) sample probe must classify by the bulk of the data.
    import spark.implicits._
    val df = loadFixture { path =>
      (Seq[Option[Long]](None, Some(0L)) ++
        instants.map(s => Some(micros(s) * 1000L)))
        .toDF("ts").coalesce(1).write.parquet(path)
    }
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts")))
      .filter(col("ts").isNotNull && unix_micros(col("ts")) =!= 0L)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == instants.map(micros).sorted)
  }

  test("INT64 probe treats an all-zero sample as vacuous (nanos default)") {
    // A sentinel-heavy prefix can fill the whole bounded 1024-row sample
    // with ts=0: max(abs)=0 says nothing about the real rows' unit, so
    // the probe must fall back to the historical nanos default instead of
    // reading a nanos file 1000x off (ADVICE r07).
    import spark.implicits._
    val df = loadFixture { path =>
      (Seq.fill(1024)(0L) ++ instants.map(s => micros(s) * 1000L))
        .toDF("ts").coalesce(1).write.parquet(path)
    }
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts")))
      .filter(unix_micros(col("ts")) =!= 0L)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == instants.map(micros).sorted)
  }

  test("load surfaces unannotated INT64-micros events.ts as TimestampType") {
    // The magnitude guard (ADVICE r06): an epoch-MICROS long surfaces as
    // the same LongType as nanos — a blind div-1000 would shift values
    // ~1000x. 2024 micros ~1.7e15 < 1e17 < 2024 nanos ~1.7e18.
    import spark.implicits._
    assertContract(loadFixture { path =>
      instants.map(micros).toDF("ts").write.parquet(path)
    })
  }

  test("load surfaces TIMESTAMP_NTZ-micros events.ts as TimestampType") {
    import spark.implicits._
    val df = instants.toDF("s")
      .select(col("s").cast(TimestampType).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    assertContract(loadFixture(path => df.write.parquet(path)))
  }

  test("load surfaces plain TIMESTAMP-micros events.ts as TimestampType") {
    import spark.implicits._
    assertContract(loadFixture { path =>
      instants.toDF("s").select(col("s").cast(TimestampType).as("ts"))
        .write.parquet(path)
    })
  }

  test("normalization covers every table's timestamp columns, not just events") {
    // orders.o_orderdate and lineitem.l_shipdate ship NTZ-annotated too;
    // strict functions would reject them the same way events.ts broke.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orders").toString
    instants.toDF("s")
      .select(lit(1L).as("o_orderkey"),
        col("s").cast(TimestampType).cast(TimestampNTZType).as("o_orderdate"))
      .write.parquet(s"$dir/orders.parquet")
    val df = Tables.orders(spark, dir)
    assert(df.schema("o_orderdate").dataType == TimestampType)
    // a long column that is not named `ts` must never be touched
    assert(df.schema("o_orderkey").dataType.typeName == "long")
  }

  // Defense in depth (the round-6 failure had TWO layers: the loader fell
  // through AND the operators' bare unix_micros rejected what fell
  // through): the timestamp-driven operators must accept an NTZ column
  // directly, not just via a normalizing loader.
  test("sessionize, funnel, and intervalJoin accept TIMESTAMP_NTZ input") {
    import spark.implicits._
    val ev = Seq(
      (1, "2024-01-01 10:00:00", "view", 1L),
      (1, "2024-01-01 10:05:00", "cart", 2L),
      (1, "2024-01-01 12:00:00", "buy", 3L))
      .toDF("user_id", "s", "etype", "event_id")
      .select(col("user_id"),
        col("s").cast(TimestampType).cast(TimestampNTZType).as("ts"),
        col("etype"), col("event_id"))
    assert(ev.schema("ts").dataType == TimestampNTZType)

    val sessions = Sessionize.sessionize(ev, "user_id", "ts", 600,
        tieBreak = Seq(col("event_id")))
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) == 1 && sessions(2L) == 1 && sessions(3L) == 2)

    val fun = Sessionize.funnel(ev, "user_id", "ts", "etype",
      Seq("view", "cart"), 3600).orderBy("step").collect()
    assert(fun.map(_.getAs[Long]("n_keys")).toSeq == Seq(1L, 1L))

    val ranges = Seq((1, "2024-01-01 09:00:00", "2024-01-01 11:00:00", "m"))
      .toDF("user_id", "f", "t", "tag")
      .select(col("user_id"),
        col("f").cast(TimestampType).cast(TimestampNTZType).as("from_ts"),
        col("t").cast(TimestampType).cast(TimestampNTZType).as("to_ts"),
        col("tag"))
    val joined = Relational.intervalJoin(
      ev, ranges, "user_id", "ts", "from_ts", "to_ts", 3600)
    assert(joined.count() == 2) // 10:00 and 10:05 fall in the interval
  }
}

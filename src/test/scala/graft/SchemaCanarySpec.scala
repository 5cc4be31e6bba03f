package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Tables

/** Testdata schema-drift canary + the schema-adaptive ts_us contract.
  *
  * Round 5 lost 18 queries because the testdata regenerated events.ts from
  * parquet TIMESTAMP(NANOS) to timestamp[us] and every query assumed one
  * writer. These specs pin (a) every table in /root/testdata/sf0.001 is
  * fully readable, and (b) [[Tables.epochMicros]] yields the identical
  * epoch-µs bigint for all three physical types a timestamp column can
  * arrive as (epoch-ns bigint, TIMESTAMP, TIMESTAMP_NTZ).
  */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every sf0.001 table reads full-width (schema-drift canary)") {
    tables.foreach { name =>
      val df = Tables(spark, sfDir, name)
      // full-width single-row materialization — fails loudly per table if a
      // physical type stops being readable
      df.limit(1).collect()
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
    }
  }

  test("events.ts_us derivation analyzes and is epoch-µs range") {
    val ev = Tables.withEpochMicros(Tables(spark, sfDir, "events"))
    val Row(lo: Long, hi: Long) =
      ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    // sanity band: years ~2001..2100 in epoch-µs — catches a silent
    // ns-vs-µs-vs-ms unit mistake by 3 orders of magnitude either way
    assert(lo > 1_000_000_000_000_000L, s"ts_us min $lo below µs range")
    assert(hi < 4_100_000_000_000_000L, s"ts_us max $hi above µs range")
  }

  test("epochMicros: identical result for epoch-ns bigint, TIMESTAMP and " +
      "TIMESTAMP_NTZ inputs") {
    val us = 1704067199123456L // 2023-12-31 23:59:59.123456 UTC
    val fromLong = spark.createDataFrame(
      java.util.List.of(Row(us * 1000L)),
      StructType(Seq(StructField("ts", LongType))))
    val fromTs = spark.createDataFrame(
      java.util.List.of(Row(java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)))),
      StructType(Seq(StructField("ts", TimestampType))))
    val fromNtz = spark.createDataFrame(
      java.util.List.of(Row(java.time.LocalDateTime.ofInstant(
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
        java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    Seq(fromLong, fromTs, fromNtz).foreach { df =>
      val got = Tables.withEpochMicros(df).select("ts_us").head().getLong(0)
      assert(got == us, s"${df.schema("ts").dataType}: $got != $us")
    }
  }

  test("epochMicros: unsupported type fails loud with a drift hint") {
    val bad = spark.range(1).select(col("id").cast("string").as("ts"))
    val e = intercept[IllegalArgumentException](Tables.epochMicros(bad))
    assert(e.getMessage.contains("schema drift"))
  }
}

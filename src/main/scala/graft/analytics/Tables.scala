package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Testdata table reader (TESTDATA.md: one parquet per table).
  *
  * `events.ts` has been observed under TWO physical writers across testdata
  * regenerations, and the engine must read BOTH (the reference's own posture
  * is schema-adaptive ingestion — `cloudFiles.inferColumnTypes`,
  * 01_bronze_ingestion.py:104-105 — so a single hard-coded writer assumption
  * is wrong here):
  *
  *   - parquet INT64 TIMESTAMP(NANOS): Spark rejects it outright
  *     ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong`
  *     (SPARK-40819) is set, which surfaces it as a bigint of epoch-ns;
  *     `ts DIV 1000` then yields epoch-µs with no truncation beyond DuckDB's
  *     own µs truncation of the same column.
  *   - parquet TIMESTAMP(MICROS) (isAdjustedToUTC either way): arrives as
  *     TIMESTAMP / TIMESTAMP_NTZ; `unix_micros` on the instant yields the
  *     identical epoch-µs bigint (sessions pin `spark.sql.session.timeZone`
  *     to UTC via [[GraftSession.configure]], so the NTZ→instant cast is the
  *     identity and matches DuckDB's `epoch_us(ts)`).
  *
  * [[epochMicros]] dispatches on the READ schema, so one helper owns the
  * unit and every query derives `ts_us` the same way for either writer.
  * The nanosAsLong flag stays set unconditionally: it is a no-op for µs
  * files and required for ns files.
  */
object Tables {
  // resolved-relation reuse (optimization guide §6, file-listing caching):
  // `spark.read.parquet` pays a driver-side file listing + footer/schema
  // resolution on EVERY call, and the bench/verify harness reads the same
  // immutable testdata tables hundreds of times per session. Caching the
  // ANALYZED DataFrame (a plan, never data) reuses the FileIndex and
  // schema; every action still computes from the parquet files. Keyed per
  // session (DataFrames are session-bound); the testdata dirs are
  // immutable for the life of a session by contract (TESTDATA.md).
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  /** Epoch-microseconds bigint from a timestamp-ish column, dispatching on
    * the physical type actually read (see object doc). Works on batch and
    * streaming frames alike (schema-only inspection). */
  def epochMicros(df: DataFrame, name: String = "ts"): Column =
    epochMicrosOf(df.schema(name).dataType, name)

  private def epochMicrosOf(dt: DataType, name: String): Column = dt match {
    case LongType         => expr(s"`$name` DIV 1000") // epoch-ns, integer µs div
    case TimestampType    => unix_micros(col(name))
    case TimestampNTZType => unix_micros(col(name).cast(TimestampType)) // UTC session → identity
    case other => throw new IllegalArgumentException(
      s"column `$name` has unsupported type $other; expected epoch-ns BIGINT " +
        "or TIMESTAMP/TIMESTAMP_NTZ (testdata schema drift? see Tables.scala)")
  }

  /** `df` plus `ts_us` = epoch-µs bigint derived from `src` (see doc). */
  def withEpochMicros(df: DataFrame, src: String = "ts",
      out: String = "ts_us"): DataFrame =
    df.withColumn(out, epochMicros(df, src))
}

/** Session-build knobs every graft entry point applies uniformly. */
object GraftSession {
  /** Confs graft readers rely on; call on the builder before getOrCreate.
    *   - nanosAsLong: read TIMESTAMP(NANOS) parquet as epoch-ns bigint
    *     (no-op on µs files) — see [[Tables]].
    *   - UTC session TZ: makes TIMESTAMP_NTZ→instant casts the identity,
    *     matching DuckDB's naive-timestamp `epoch_us`.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
}

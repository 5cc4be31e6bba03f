package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table reader (TESTDATA.md: one parquet per table).
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS), which Spark's
  * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The supported
  * escape hatch is `spark.sql.legacy.parquet.nanosAsLong` (SPARK-40819),
  * which surfaces the column as a bigint of epoch-nanoseconds — full
  * precision, no truncation, and integer arithmetic (`ts DIV 1000` → µs)
  * keeps it deterministic against the DuckDB oracle (DuckDB truncates the
  * same column to µs on read).
  *
  * The flag is session-level and must be set ONCE at session build (see
  * [[GraftSession.configure]], applied by Verify/Bench/test sessions) —
  * a reader helper mutating session conf per table read would be a global
  * side effect in the hot path.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Session-build knobs every graft entry point applies uniformly. */
object GraftSession {
  /** Confs graft readers rely on; call on the builder before getOrCreate. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
}

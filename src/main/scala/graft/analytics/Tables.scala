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
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}

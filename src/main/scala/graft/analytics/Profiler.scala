package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-generic table profiling — the data-quality census (the
  * deequ/Great-Expectations "profile" pass) that precedes writing
  * expectation rules: per column, row/null/distinct counts, typed
  * min/max, and mean string length. One row out per column, so the
  * result is queryable/diffable across snapshots (join two profiles on
  * `col_name` to detect drift).
  *
  * Shape: ONE wide aggregate over the table computes every metric, then
  * a driver-built literal unpivot (explode over structs of the 1-row
  * aggregate) goes long — so the table is scanned once regardless of
  * column count. The only caveat at scale is exact distinct counts:
  * multiple `count(DISTINCT c)` in one aggregate expand the input
  * ×(distinct-column count) before the shuffle (Spark's Expand), which
  * at 100 TB × 16 columns is a 1.6 PB shuffle. `exactDistinct = false`
  * (the default) therefore uses `approx_count_distinct` (HLL, one pass,
  * no expand, ~±5% rsd); the exact form exists for gate-checkable runs and
  * modest tables.
  *
  * Metric typing is portability-driven (bit-exact oracle): counts are
  * longs; numeric min/max surface as DECIMAL(38,6) in `min_num`/
  * `max_num` (NULL for non-numerics); date/timestamp/string/boolean
  * min/max surface as ISO strings in `min_str`/`max_str`; mean string
  * length is exact integer micro-units (`avg_len_x1e6` = (Σlen·10⁶) div
  * n) rather than a float division. Nulls are excluded from min/max/
  * distinct (SQL semantics); a column with no non-null values yields
  * NULL metrics. */
object Profiler {

  private def ldiv(a: Column, b: Column): Column = call_function("div", a, b)

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    require(df.schema.fields.nonEmpty, "cannot profile a zero-column frame")
    val fields = df.schema.fields.toSeq

    def metricsFor(f: StructField): Seq[(String, Column)] = {
      val c = col(s"`${f.name}`")
      val strForm: Option[Column] = f.dataType match {
        case StringType => Some(c)
        case DateType | TimestampType | TimestampNTZType | BooleanType =>
          Some(c.cast("string"))
        case _ => None
      }
      val numForm: Option[Column] = f.dataType match {
        case _: NumericType => Some(c.cast("decimal(38,6)"))
        case _ => None
      }
      val distinct =
        if (exactDistinct) count_distinct(c)
        else approx_count_distinct(c)
      Seq(
        "n_nulls" -> sum(when(c.isNull, 1L).otherwise(0L)),
        "n_distinct" -> distinct,
        "min_num" -> numForm.map(min).getOrElse(lit(null).cast("decimal(38,6)")),
        "max_num" -> numForm.map(max).getOrElse(lit(null).cast("decimal(38,6)")),
        "min_str" -> strForm.map(min).getOrElse(lit(null).cast("string")),
        "max_str" -> strForm.map(max).getOrElse(lit(null).cast("string")),
        "avg_len_x1e6" -> (f.dataType match {
          case StringType =>
            val nonNull = count(c)
            when(nonNull > 0L,
              ldiv(sum(length(c).cast("decimal(38,0)")) * lit(1000000L),
                nonNull.cast("decimal(38,0)")))
          case _ => lit(null).cast("long")
        }))
    }

    val aggExprs = fields.flatMap(f => metricsFor(f).map { case (m, e) =>
      e.as(s"_p_${f.name}_$m")
    })
    val wide = df.agg(count(lit(1)).as("_p_n_rows"), aggExprs: _*)

    val structs = fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col("_p_n_rows").as("n_rows"),
        col(s"`_p_${f.name}_n_nulls`").cast("long").as("n_nulls"),
        col(s"`_p_${f.name}_n_distinct`").cast("long").as("n_distinct"),
        col(s"`_p_${f.name}_min_num`").as("min_num"),
        col(s"`_p_${f.name}_max_num`").as("max_num"),
        col(s"`_p_${f.name}_min_str`").as("min_str"),
        col(s"`_p_${f.name}_max_str`").as("max_str"),
        col(s"`_p_${f.name}_avg_len_x1e6`").cast("long").as("avg_len_x1e6"))
    }
    wide.select(explode(array(structs: _*)).as("_m")).select(col("_m.*"))
  }
}

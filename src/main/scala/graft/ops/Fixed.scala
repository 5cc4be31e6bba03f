package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Fixed-point integer arithmetic helpers shared by the exact-oracle
  * operators (PageRank, sampling targets, z-order buckets, association
  * metrics, target encoding, profiler rates). */
object Fixed {

  /** True integer floor division (Spark's `div` operator / DuckDB's
    * `//`). `Column./` on integral types is DOUBLE division — casting
    * its result back to long truncates the correctly-ROUNDED quotient,
    * which can exceed the true floor when the rational quotient sits
    * within half an ulp below an integer, silently breaking
    * bit-exactness. Operands may be integral or decimal (IntegralDivide
    * supports both; the result is a long). */
  def ldiv(a: Column, b: Column): Column = call_function("div", a, b)
}

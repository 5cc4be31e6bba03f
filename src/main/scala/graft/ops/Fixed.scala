package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit, when}

/** Fixed-point integer arithmetic helpers shared by the exact-oracle
  * operators (PageRank, sampling targets, z-order buckets, association
  * metrics, target encoding, profiler rates). */
object Fixed {

  /** True integer floor division. Two traps this avoids: `Column./` on
    * integral types is DOUBLE division — casting its result back to
    * long truncates the correctly-ROUNDED quotient, which can exceed
    * the true floor when the rational quotient sits within half an ulp
    * below an integer; and Spark's `div` operator truncates toward
    * ZERO, which exceeds the floor by one whenever the operand signs
    * differ and the division is inexact. The sign adjustment below
    * closes the second gap. Operands may be integral or decimal
    * (IntegralDivide supports both; the result is a long).
    *
    * ORACLE PARITY: DuckDB's `//` ALSO truncates toward zero
    * (empirically `-7 // 2 = -3`, not the floor −4), so `//` matches
    * ldiv only when quotients are non-negative or exact. An oracle
    * dividing a possibly-negative inexact numerator must spell the
    * floor out: `CASE WHEN x % y <> 0 AND x < 0 THEN x // y - 1 ELSE
    * x // y END` (positive divisor) — the q_seasonal_daily pattern. */
  def ldiv(a: Column, b: Column): Column = {
    val q = call_function("div", a, b)
    val r = a % b
    // a % b carries the dividend's sign, so r != 0 with sign(r) !=
    // sign(b) is exactly the "truncation exceeded the floor" case
    when(r =!= lit(0) && (r < lit(0)) =!= (b < lit(0)), q - lit(1L))
      .otherwise(q)
  }
}

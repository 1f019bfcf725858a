package graft.queries

/** Literal-formatting helpers for generated DuckDB oracle SQL.
  *
  * A bare decimal literal in DuckDB parses as DECIMAL and reaches DOUBLE via
  * a DECIMAL→DOUBLE cast that computes numerator/10^scale in double
  * arithmetic — for 16-17-significant-digit values the numerator exceeds
  * 2^53 and the result can be one ulp off the engine-side Scala double.
  * Routing the literal through a VARCHAR→DOUBLE parse is correctly rounded
  * and reproduces the Scala double bit-for-bit.
  */
object OracleSql {
  def d(x: Double): String = s"'$x'::DOUBLE"
}

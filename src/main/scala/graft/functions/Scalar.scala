package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OpenEO scalar process sub-language, expressed as pure Catalyst `Column`
  * expression builders — the engine's equivalent of the reference's
  * per-cell numpy callbacks (reference: openeo_processes_dask/
  * process_implementations/math.py, comparison.py, logic.py, text.py).
  *
  * Design (SURVEY.md §7.1): a callback chain compiles to ONE Column tree, so
  * whole-stage codegen fuses the entire `apply` pipeline into a single
  * generated loop — no per-element interpreter, no UDFs.
  *
  * Null policy: the reference upcasts to float64 and encodes nodata as NaN
  * (reference: docs/decisions/handle-nodata-in-rastercubes.md:72-78); we use
  * Spark SQL `null`, whose 3-valued propagation already matches the
  * reference's NaN-propagation in arithmetic and comparisons.
  */
object Scalar {

  // ---- constants (reference: math.py:75-94) ----
  val e: Column = lit(math.E)
  val pi: Column = lit(math.Pi)
  /** reference: math.py:83-91 — the engine-native nodata literal; we keep
    * numpy's NaN rather than null so `is_nan` can see it explicitly.
    */
  val nan: Column = lit(Double.NaN)
  def constant(x: Any): Column = lit(x)

  // ---- binary arithmetic (reference: math.py:98-117,288-329) ----
  def add(x: Column, y: Column): Column = x + y
  def subtract(x: Column, y: Column): Column = x - y
  def multiply(x: Column, y: Column): Column = x * y
  def divide(x: Column, y: Column): Column = x / y
  def mod(x: Column, y: Column): Column = pmod(x, y) // numpy mod = sign of divisor
  def power(base: Column, p: Column): Column = pow(base, p)
  def arctan2(y: Column, x: Column): Column = atan2(y, x)
  def logBase(x: Column, base: Column): Column = log(x) / log(base)

  // ---- unary (reference: math.py:212-338) ----
  def floorC(x: Column): Column = floor(x)
  def ceilC(x: Column): Column = ceil(x)
  def int(x: Column): Column = // truncation toward zero (reference: math.py:220)
    when(x >= 0, floor(x)).otherwise(ceil(x))
  def roundHalfEven(x: Column, p: Int = 0): Column = bround(x, p) // numpy banker's rounding (math.py:224)
  def expC(x: Column): Column = exp(x)
  def ln(x: Column): Column = log(x)
  def absolute(x: Column): Column = abs(x)
  def sgn(x: Column): Column = signum(x)
  def sqrtC(x: Column): Column = sqrt(x)

  // ---- trigonometry (reference: math.py:240-285) ----
  // Out-of-domain inputs (e.g. arccos(2)) yield NaN in both numpy and Spark.
  def sinC(x: Column): Column = sin(x)
  def cosC(x: Column): Column = cos(x)
  def tanC(x: Column): Column = tan(x)
  def arcsin(x: Column): Column = asin(x)
  def arccos(x: Column): Column = acos(x)
  def arctan(x: Column): Column = atan(x)
  def sinhC(x: Column): Column = sinh(x)
  def coshC(x: Column): Column = cosh(x)
  def tanhC(x: Column): Column = tanh(x)
  def arsinh(x: Column): Column = asinh(x)
  def arcosh(x: Column): Column = acosh(x)
  def artanh(x: Column): Column = atanh(x)

  /** reference: math.py:330-338. */
  def clip(x: Column, min: Double, max: Double): Column = {
    if (min > max) throw new IllegalArgumentException(
      "MinMaxSwapped: the minimum value should be lower than or equal " +
        "to the maximum value")
    least(greatest(x, lit(min)), lit(max))
  }

  /** Rescale [inputMin, inputMax] → [outputMin, outputMax], clipping first
    * (reference: math.py:292-298).
    */
  def linearScaleRange(x: Column, inMin: Double, inMax: Double,
      outMin: Double = 0.0, outMax: Double = 1.0): Column = {
    val clipped = clip(x, math.min(inMin, inMax), math.max(inMin, inMax))
    (clipped - inMin) / (inMax - inMin) * (outMax - outMin) + outMin
  }

  /** (x - y) / (x + y) (reference: math.py:412-414). */
  def normalizedDifference(x: Column, y: Column): Column = (x - y) / (x + y)

  // ---- comparison (reference: comparison.py) ----
  /** Null-propagating equality with optional numeric tolerance and
    * case-insensitivity (reference: comparison.py:46-85). Spark's `===`
    * already returns null when either side is null — matching the
    * reference's NaN-propagation.
    */
  def eq(x: Column, y: Column, delta: Option[Double] = None,
      caseSensitive: Boolean = true): Column = delta match {
    case Some(d) => abs(x - y) <= lit(d)
    case None if !caseSensitive => lower(x) === lower(y)
    case None => x === y
  }
  def neq(x: Column, y: Column, delta: Option[Double] = None,
      caseSensitive: Boolean = true): Column = !eq(x, y, delta, caseSensitive)
  def gt(x: Column, y: Column): Column = x > y
  def gte(x: Column, y: Column): Column = x >= y
  def lt(x: Column, y: Column): Column = x < y
  def lte(x: Column, y: Column): Column = x <= y

  /** reference: comparison.py:120-132. */
  def between(x: Column, min: Column, max: Column,
      excludeMax: Boolean = false): Column =
    if (excludeMax) x >= min && x < max else x >= min && x <= max

  def isNodata(x: Column): Column = x.isNull // reference: comparison.py:36-37
  def isValid(x: Column): Column = x.isNotNull && !isnan(x) // comparison.py:31-33
  def isNanC(x: Column): Column = x.isNull || isnan(x) // comparison.py:40-43 (null==NaN here)
  def isInfinite(x: Column): Column =
    x === lit(Double.PositiveInfinity) || x === lit(Double.NegativeInfinity)

  // ---- logic (reference: logic.py) ----
  /** Spark &&/||/! already implement SQL 3-valued logic, which coincides with
    * the reference's NaN-encoded Kleene logic (reference: logic.py:11-47).
    */
  def and(x: Column, y: Column): Column = x && y
  def or(x: Column, y: Column): Column = x || y
  def xor(x: Column, y: Column): Column =
    (x || y) && !(x && y) // 3-valued: null-propagating (logic.py:35-41)
  def not(x: Column): Column = !x
  /** reference: logic.py:50-55 — reject defaults to nodata. */
  def ifThen(cond: Column, accept: Column, reject: Column = lit(null)): Column =
    when(cond, accept).otherwise(reject)

  // ---- text (reference: text.py) ----
  private def caseFold(s: Column, cs: Boolean): Column = if (cs) s else lower(s)
  def textBegins(data: Column, pattern: String, caseSensitive: Boolean = true): Column =
    caseFold(data, caseSensitive).startsWith(if (caseSensitive) pattern else pattern.toLowerCase)
  def textContains(data: Column, pattern: String, caseSensitive: Boolean = true): Column =
    caseFold(data, caseSensitive).contains(if (caseSensitive) pattern else pattern.toLowerCase)
  def textEnds(data: Column, pattern: String, caseSensitive: Boolean = true): Column =
    caseFold(data, caseSensitive).endsWith(if (caseSensitive) pattern else pattern.toLowerCase)
  /** reference: text.py:41-55 — only bool/None reprs are lowercased, and
    * null items render as "none" (Spark's boolean→string cast is already
    * lowercase, so only the null spelling needs handling; `concat_ws` would
    * otherwise drop null items entirely).
    */
  def textConcat(items: Seq[Column], separator: String): Column =
    concat_ws(separator, items.map(c => coalesce(c.cast("string"), lit("none"))): _*)

  // ---- dates (reference: dates.py) ----
  def dateBetween(x: Column, min: Column, max: Column,
      excludeMax: Boolean = true): Column =
    if (excludeMax) x >= min && x < max else x >= min && x <= max

  /** Difference date2 - date1 in `unit` (reference: dates.py:29-61). */
  def dateDifference(date1: Column, date2: Column, unit: String): Column =
    unit match {
      case "millisecond" => (date2.cast("double") - date1.cast("double")) * 1000.0
      case "second" => date2.cast("double") - date1.cast("double")
      case "minute" => (date2.cast("double") - date1.cast("double")) / 60.0
      case "hour"   => (date2.cast("double") - date1.cast("double")) / 3600.0
      case "day"    => datediff(date2, date1).cast("double")
      case "month"  => (year(date2) * 12 + month(date2)
                        - year(date1) * 12 - month(date1)).cast("double")
      case "year"   => (year(date2) - year(date1)).cast("double")
      case u => throw new IllegalArgumentException(s"unknown unit $u")
    }

  /** Shift with month-end clamping for month/year units, which
    * `add_months` already implements (reference: dates.py:64-126).
    */
  def dateShift(date: Column, value: Int, unit: String): Column = unit match {
    case "year"  => add_months(date, value * 12)
    case "month" => add_months(date, value)
    case "week"  => date_add(date, value * 7)
    case "day"   => date_add(date, value)
    case "hour" | "minute" | "second" | "millisecond" =>
      date + expr(s"INTERVAL $value $unit")
    case u => throw new IllegalArgumentException(s"unknown unit $u")
  }
}

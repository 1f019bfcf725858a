package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Custom optimizer rule: rewrite timestamp comparisons over the
  * nanos→micros conversion into raw-long comparisons so they reach the
  * parquet scan as pushed filters.
  *
  * The event tables carry INT64 TIMESTAMP(NANOS), which Spark reads as a
  * long (`nanosAsLong`) and this engine converts with
  * `timestamp_micros(ts div 1000)`. Catalyst pushes the Filter below the
  * Project (inlining the conversion) but the file source cannot translate
  * `timestamp_micros(ts div 1000) >= lit` into a parquet filter, so
  * temporal scans read the whole table. This rule replaces such comparisons
  * with their exact raw-domain equivalents (valid for non-negative
  * timestamps, i.e. post-1970 data; T in micros):
  *
  *   trunc(raw/1000) ≥ T  ⇔  raw ≥ T·1000
  *   trunc(raw/1000) > T  ⇔  raw ≥ (T+1)·1000
  *   trunc(raw/1000) < T  ⇔  raw < T·1000
  *   trunc(raw/1000) ≤ T  ⇔  raw < (T+1)·1000
  *
  * The rewritten predicate compares a plain bigint column with a literal —
  * ordinary DataSource pushdown then carries it into PushedFilters. At
  * 100 TB of events this is the difference between scanning a time slice
  * and scanning the table. Substitution (not augmentation) keeps the rule
  * naturally idempotent under the fixpoint batch it runs in
  * (`spark.experimental.extraOptimizations`).
  */
object NanosPredicatePushdown extends Rule[LogicalPlan] {

  private object Conv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case GreaterThanOrEqual(Conv(raw), TsLit(t)) =>
          GreaterThanOrEqual(raw, Literal(t * 1000L, LongType))
        case GreaterThan(Conv(raw), TsLit(t)) =>
          GreaterThanOrEqual(raw, Literal((t + 1) * 1000L, LongType))
        case LessThan(Conv(raw), TsLit(t)) =>
          LessThan(raw, Literal(t * 1000L, LongType))
        case LessThanOrEqual(Conv(raw), TsLit(t)) =>
          LessThan(raw, Literal((t + 1) * 1000L, LongType))
        case LessThanOrEqual(TsLit(t), Conv(raw)) =>
          GreaterThanOrEqual(raw, Literal(t * 1000L, LongType))
        case LessThan(TsLit(t), Conv(raw)) =>
          GreaterThanOrEqual(raw, Literal((t + 1) * 1000L, LongType))
        case GreaterThan(TsLit(t), Conv(raw)) =>
          LessThan(raw, Literal(t * 1000L, LongType))
        case GreaterThanOrEqual(TsLit(t), Conv(raw)) =>
          LessThan(raw, Literal((t + 1) * 1000L, LongType))
        case IsNotNull(Conv(raw)) => IsNotNull(raw)
      }
      Filter(rewritten, child)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive a pushable `StartsWith` from an anchored-regex
  * filter. The discovery operators filter filenames with `rlike
  * '^<literal prefix>...'` (reference A2's `re.match` semantics,
  * s3-discovery/handler.py:35) — a predicate no file source can push
  * down, so every object key is read and tested. Any string matching an
  * `^`-anchored pattern must literally start with the pattern's leading
  * literal run, so `col rlike '^OMI_trno2_.*\.he5$'` implies
  * `startswith(col, 'OMI_trno2_')` — and `StartsWith` IS pushable
  * (Parquet row-group stats, DSv2 `StringStartsWith`), pruning the scan
  * while the original regex still runs as the exact residual.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`);
  * idempotent — a conjunct is only added when the equivalent
  * `StartsWith` is not already present.
  */
object RegexPrefixPushdown extends Rule[LogicalPlan] {

  /** Leading literal run of an `^`-anchored Java regex: characters after
    * `^` up to the first metacharacter. None when the pattern is not
    * anchored (or the run is empty — nothing to push). */
  private[graft] def literalPrefix(pattern: String): Option[String] = {
    if (!pattern.startsWith("^")) None
    else {
      val meta = "\\.[](){}*+?|^$"
      val run = pattern.drop(1).takeWhile(c => !meta.contains(c))
      if (run.isEmpty) None else Some(run)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val parts = conjuncts(cond)
      val extra = parts.collect {
        case RLike(attr, Literal(pat: UTF8String, StringType)) =>
          literalPrefix(pat.toString).map(p =>
            StartsWith(attr, Literal(UTF8String.fromString(p), StringType)))
      }.flatten
        // idempotency: skip prefixes already present as conjuncts
        .filterNot(sw => parts.exists(_.semanticEquals(sw)))
      if (extra.isEmpty) f
      else f.copy(condition = (extra :+ cond).reduceLeft(And))
  }
}

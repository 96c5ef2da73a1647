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
    * anchored, the run is empty, or the inference would be UNSOUND:
    *
    *  - a top-level unescaped `|` anywhere in the pattern alternates
    *    against the `^` anchor itself (`RLike` has contains semantics, so
    *    `^a|b` matches any string containing `b` — no prefix holds);
    *  - a `*`, `?`, or `{` quantifier immediately after the run makes the
    *    run's LAST character optional (`^logs?` matches "log…"), so that
    *    character is dropped from the pushed prefix (`+` keeps it — at
    *    least one occurrence is still required). */
  private[graft] def literalPrefix(pattern: String): Option[String] = {
    if (!pattern.startsWith("^")) None
    else {
      val body = pattern.drop(1)
      // scan the WHOLE body for a top-level (depth-0, outside a character
      // class, unescaped) alternation — if present, bail
      var i = 0; var depth = 0; var inClass = false; var topAlt = false
      while (i < body.length && !topAlt) {
        body.charAt(i) match {
          case '\\' => i += 1 // skip the escaped char
          case '[' if !inClass => inClass = true
          case ']' if inClass => inClass = false
          case '(' if !inClass => depth += 1
          case ')' if !inClass && depth > 0 => depth -= 1
          case '|' if !inClass && depth == 0 => topAlt = true
          case _ =>
        }
        i += 1
      }
      if (topAlt) None
      else {
        val meta = "\\.[](){}*+?|^$"
        val run0 = body.takeWhile(c => !meta.contains(c))
        val next = if (run0.length < body.length) Some(body.charAt(run0.length)) else None
        val run = if (next.exists(c => c == '*' || c == '?' || c == '{'))
          run0.dropRight(1) else run0
        if (run.isEmpty) None else Some(run)
      }
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

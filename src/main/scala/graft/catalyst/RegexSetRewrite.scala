package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.{In, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.matchers.Matcher

/** Optimizer rule: rewrite a fully-anchored literal-alternation regex
  * predicate into an IN-list — the reference's set-regex fast path
  * (`querier.go:284-324`, "Optimize queries using regexp for set
  * lookups").
  *
  * `col RLIKE '^(?:a|b|c)$'` becomes `col IN ('a','b','c')`, which
  * Catalyst can further convert to InSet and push into the parquet
  * scan as an `In` filter — regex predicates never push down. Only
  * anchored patterns are rewritten (Spark's RLIKE is find()-style
  * unanchored, so a bare `a|b|c` matches substrings and must keep its
  * regex semantics). Null flows identically: both RLIKE and IN return
  * NULL on a NULL input.
  */
object RegexSetRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case rl @ RLike(child, Literal(p: UTF8String, StringType)) =>
        Matcher.anchoredSetMatches(p.toString) match {
          case Some(lits) => In(child, lits.map(Literal(_)))
          case None       => rl
        }
    }
}

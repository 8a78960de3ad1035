package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, HigherOrderFunction, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule closing the generator-projection trap SCALING.md
  * documents with measurements: a projection computed NEXT TO a
  * generator is evaluated once per GENERATED row, so a doc-level
  * expression carried through an `explode` re-runs per token —
  * `select(token_id(text) % 100, explode(tokenize(text)))` cost 64 s
  * where the same stream without the carried hash cost 13 s at the
  * 100× corpus (the full-text hash itself is a 1 s pass when evaluated
  * once per document). CollapseProject folds the user's innocent-looking
  * two-step select into exactly that shape, so the trap is easy to hit
  * and invisible in the logical plan a user writes.
  *
  * The rewrite: any deterministic, expensive projection that references
  * ONLY generator-independent columns moves into a Project BELOW the
  * Generate — evaluated once per input row — and the original slot
  * becomes a plain attribute reference. "Expensive" = contains a
  * higher-order function or one of the engine's native expressions
  * (TokenId, CosineSim, BpeEncode, ShingleHashes, RepetitionStats);
  * cheap arithmetic stays put, since carrying an extra column through a
  * wide explode is not free either. Subquery-bearing and
  * non-deterministic expressions never move.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`, so any
  * session built with the extensions is protected automatically; the
  * engine's own declared queries avoid the shape by construction (see
  * the q81/q92 scaladoc). Semantics are unchanged — the expression is
  * deterministic and per-input-row evaluation produces the value every
  * generated row would have computed (equality-tested in ScaleSpec).
  */
object PushExpensiveProjectionsBelowGenerate extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: HigherOrderFunction => true
    case x => x.getClass.getName.startsWith("graft.plans.")
  }

  private def pushable(a: Alias, genChild: LogicalPlan): Boolean =
    a.child.deterministic &&
      a.child.references.nonEmpty &&
      a.child.references.subsetOf(genChild.outputSet) &&
      !a.child.exists(_.isInstanceOf[PlanExpression[_]]) &&
      isExpensive(a.child)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, g: Generate)
        if projList.exists { case a: Alias => pushable(a, g.child); case _ => false } =>
      val pushed = scala.collection.mutable.ArrayBuffer.empty[Alias]
      val newList = projList.map {
        case a: Alias if pushable(a, g.child) =>
          pushed += a
          a.toAttribute
        case other => other
      }
      val newGenChild = Project(g.child.output ++ pushed, g.child)
      p.copy(projectList = newList, child = g.copy(child = newGenChild))
  }
}

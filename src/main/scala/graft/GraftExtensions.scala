package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.GraftFunctions

/** Engine integration via `SparkSessionExtensions`:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * installs (1) the full SQL function surface (no explicit register() call)
  * and (2) the [[FoldKernelCalls]] optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FoldKernelCalls)
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}

/** Plan-time constant folding for the engine's kernel calls.
  *
  * Kernel scalars bind through `StaticInvoke`, which Catalyst never treats as
  * foldable — so `series_key(map('__name__','up'), '')` in a predicate stays
  * a runtime call and blocks datasource pushdown of the comparison. All
  * kernels are pure; when every argument is foldable, evaluate once at
  * planning and substitute the literal. The comparison then folds to
  * `col = <literal>` and reaches the scan as a pushed filter — at 100 TB
  * that is the difference between reading one series' row groups and all of
  * them.
  */
object FoldKernelCalls extends Rule[LogicalPlan] {
  private val kernel = graft.functions.PromCatalyst.getClass

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case si: StaticInvoke
        if si.staticObject == kernel && si.arguments.forall(_.foldable) =>
      try Literal.create(si.eval(InternalRow.empty), si.dataType)
      catch { case _: Exception => si }
  }
}

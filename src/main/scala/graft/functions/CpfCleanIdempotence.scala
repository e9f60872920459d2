package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `cpf_clean(cpf_clean(x))` → `cpf_clean(x)`.
  *
  * The clean is idempotent (property-tested in PropertySpec), so nested
  * applications — which arise naturally when composed pipelines each
  * defensively clean their inputs — collapse to one byte-scan. This is
  * the `Rule[LogicalPlan]` extension-point demonstration (SURVEY §4.2
  * listed it as the only custom-rule candidate); it is injected through
  * the same [[GraftExtensions]] used for SQL function registration, and
  * also installable on a live session for tests.
  */
object CpfCleanIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CpfClean(inner @ CpfClean(_)) => inner
    }

  /** Install on a running session (extensions only apply at build).
    * Synchronized: the bench's parallel compile pass can race two
    * queries into the same session's check-then-append. */
  def install(spark: SparkSession): Unit = synchronized {
    val o = spark.sessionState.experimentalMethods
    if (!o.extraOptimizations.contains(this))
      o.extraOptimizations = o.extraOptimizations :+ this
  }
}

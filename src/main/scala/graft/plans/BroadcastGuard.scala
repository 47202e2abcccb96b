package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guard-rail: strip `broadcast()` hints from plans whose
  * estimated size exceeds a ceiling.
  *
  * Why it exists: a hard `broadcast()` hint *overrides*
  * `spark.sql.autoBroadcastJoinThreshold` and AQE — a hint placed on a
  * data-proportional table ("customer is small today") ships the whole
  * table to every executor and OOMs the driver the day the table has grown
  * 100×. This rule turns that latent scale bug into a silent fallback to
  * whatever join AQE picks, which is the behaviour the author of the hint
  * actually wanted. The bounded dimensions this library hints (nation,
  * region, supplier, probe sets, PQ codebooks) sit far below any sane
  * ceiling, so their hints always survive.
  *
  * The ceiling comes from `spark.graft.broadcastGuard.maxBytes`
  * (default 8 GiB — far above `autoBroadcastJoinThreshold`, so only
  * clearly-wrong hints are stripped; set to -1 to disable). Size estimates
  * are Catalyst's `LogicalPlan.stats.sizeInBytes` — the same statistics the
  * planner itself would use to size the broadcast exchange.
  *
  * Injected by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`, so any session built with the library's
  * `spark.sql.extensions` gets the guard automatically.
  */
class BroadcastGuard extends Rule[LogicalPlan] {

  val MAX_BYTES_KEY = "spark.graft.broadcastGuard.maxBytes"
  val DEFAULT_MAX_BYTES: Long = 8L << 30

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxBytes =
      try conf.getConfString(MAX_BYTES_KEY, DEFAULT_MAX_BYTES.toString).toLong
      catch { case _: NumberFormatException => DEFAULT_MAX_BYTES }
    if (maxBytes < 0) plan
    else plan.transformUp {
      // By the time user-injected rules run, EliminateResolvedHint has
      // already folded broadcast() hints into the Join node's JoinHint —
      // so the guard scrubs oversized sides there.
      case j @ Join(left, right, _, _, hint) =>
        // Only act where the size-only estimate is trustworthy: a Join in
        // the hinted subtree makes sizeInBytes the PRODUCT of its children
        // (orders of magnitude high for derived sides like probe⋈embedding
        // lookups), which would strip deliberate hints on tiny frames. The
        // bug class this guards — a hint on a base table that outgrew its
        // author's assumption — has a join-free subtree by definition.
        def estimable(side: LogicalPlan): Boolean =
          side.collectFirst { case jj: Join => jj }.isEmpty
        def scrub(h: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
          h match {
            case Some(HintInfo(Some(BROADCAST)))
                if estimable(side) && side.stats.sizeInBytes > maxBytes =>
              logWarning("BroadcastGuard: dropping broadcast hint on a " +
                s"join side estimated at ${side.stats.sizeInBytes} bytes " +
                s"(> $MAX_BYTES_KEY=$maxBytes); letting AQE choose the join")
              None
            case other => other
          }
        val (nl, nr) = (scrub(hint.leftHint, left), scrub(hint.rightHint, right))
        if (nl != hint.leftHint || nr != hint.rightHint)
          j.copy(hint = JoinHint(nl, nr))
        else j
    }
  }
}

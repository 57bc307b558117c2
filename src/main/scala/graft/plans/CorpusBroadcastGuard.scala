package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Engine-level guard: a corpus-derived plan whose width estimate is blind
  * may never be the build side of an estimate-based broadcast join.
  *
  * The failure class this closes (round-17, SF30 cluster): Catalyst's
  * size-only estimator prices an `ArrayType`/`MapType` column at its
  * `defaultSize` — a handful of bytes — so any plan that carries (or ever
  * carried, upstream of a projection) variable-length collections has a
  * `sizeInBytes` that is off by orders of magnitude from its in-memory
  * `HashedRelation` width. A shingle-set self-join estimated at ~100 MB
  * built a multi-GB broadcast and killed the driver; the same blindness
  * recurred one threshold notch later on the verify back-join. The fix was
  * three hand-placed `SHUFFLE_MERGE` hints — which protect exactly three
  * call sites. This rule is the engine-level form: the *planner* refuses
  * the untrustworthy broadcast, so the next corpus×corpus join someone
  * writes is safe by construction.
  *
  * Semantics (per join side, batch plans only):
  *  - a side is *blind* when any node in its subtree outputs an array- or
  *    map-typed column (the width underestimate survives projection: a
  *    downstream estimate is width-scaled from the already-wrong upstream
  *    one) **and** the subtree reads at least one non-local leaf (a file /
  *    datasource scan — `LocalRelation`/`Range` sizes are exact driver-side
  *    facts, not estimates, so e.g. a broadcast k-means centroid frame is
  *    never penalized);
  *  - **both sides blind → stamp `NO_BROADCAST_HASH` on both**, at any
  *    size: neither estimate is trustworthy, and the sort-merge form is
  *    safe at every scale (for self-joins it additionally reuses one
  *    exchange for both sides);
  *  - **one side blind → stamp that side only when its largest leaf scan
  *    already exceeds `autoBroadcastJoinThreshold`**: below it, everything
  *    derived from the scan genuinely fits in memory and broadcast is
  *    fine (fixture scale); above it, the derived estimate cannot be
  *    trusted to have shrunk. The scalar side keeps every option —
  *    dimension broadcasts onto a corpus are untouched.
  *
  * Explicit strategy hints always win: the rule never overwrites a side
  * that already carries one, so `broadcast(df)` remains an override for
  * callers who *know* a collection-typed frame is small. AQE's runtime
  * SMJ→BHJ conversion is intentionally also blocked for stamped sides —
  * post-shuffle byte counts are accurate, but a corpus-wide build side is
  * exactly what a 1000-executor deployment must never ship to one JVM.
  *
  * Reference analogue: the planner's structural refusal to broadcast
  * estimate-risk joins (`fe/src/main/java/com/cloudera/impala/planner/
  * Planner.java:431-489` refuses broadcast for right/full-outer joins
  * regardless of cost); here the structural risk class is
  * collection-typed corpus payloads. Injected via [[graft.GraftExtensions]]
  * as a pre-CBO rule (after operator optimization, before join reorder —
  * stamped joins are exactly those where reorder has nothing to offer).
  * CorpusBroadcastGuardSpec asserts the stamps; DedupSpec asserts the
  * executed-plan consequence on the (now hint-free) MinHash pipeline.
  */
object CorpusBroadcastGuard extends Rule[LogicalPlan] {

  private def hasCollection(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType => true
    case s: StructType             => s.fields.exists(f => hasCollection(f.dataType))
    case _                         => false
  }

  /** Leaves whose `sizeInBytes` is an exact driver-side fact rather than an
    * estimate of remote data. */
  private def isLocalLeaf(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation | _: OneRowRelation | _: Range => true
    case _                                               => false
  }

  private def blind(side: LogicalPlan): Boolean =
    side.exists(_.output.exists(a => hasCollection(a.dataType))) &&
      side.collectLeaves().exists(l => !isLocalLeaf(l))

  /** Largest non-local leaf estimate on the side — the scan the derived
    * estimate was scaled from. */
  private def maxScanBytes(side: LogicalPlan): BigInt =
    side.collectLeaves().filterNot(isLocalLeaf)
      .map(_.stats.sizeInBytes).foldLeft(BigInt(0))(_ max _)

  private def stamp(h: Option[HintInfo]): Option[HintInfo] =
    Some(h.getOrElse(HintInfo()).copy(strategy = Some(NO_BROADCAST_HASH)))

  /** True when this side may be stamped (no explicit strategy hint yet). */
  private def unhinted(h: Option[HintInfo]): Boolean =
    h.forall(_.strategy.isEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    plan.transform {
      case j @ Join(left, right, _, _, hint)
          if !left.isStreaming && !right.isStreaming &&
            (unhinted(hint.leftHint) || unhinted(hint.rightHint)) =>
        val lBlind = blind(left)
        val rBlind = blind(right)
        def oneSidedRisk(side: LogicalPlan): Boolean =
          threshold >= 0 && maxScanBytes(side) > threshold
        val stampL = unhinted(hint.leftHint) && lBlind &&
          (rBlind || oneSidedRisk(left))
        val stampR = unhinted(hint.rightHint) && rBlind &&
          (lBlind || oneSidedRisk(right))
        if (!stampL && !stampR) j
        else j.copy(hint = JoinHint(
          if (stampL) stamp(hint.leftHint) else hint.leftHint,
          if (stampR) stamp(hint.rightHint) else hint.rightHint))
    }
  }
}

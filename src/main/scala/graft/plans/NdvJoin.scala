package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/**
 * ANALYZE-stats-driven join planning: per-column NDV measured by
 * [[graft.core.Catalog.analyzeTable]] (one KMV-sketch pass, stored in
 * `_graft.json`) feeds Spark's join-strategy choice.
 *
 * Why Spark needs the help: with basic (size-only) statistics, an
 * `Aggregate`'s size estimate is proportional to its CHILD's scan size —
 * but the true output cardinality of `GROUP BY c` is ndv(c), which no
 * file size reveals. A `status`-grouped aggregate of a 100 TB table is
 * FOUR rows; Spark's estimate keeps it terabyte-sized, the broadcast
 * opportunity is missed, and the join pays a full shuffle of the fact
 * side. Conversely a high-NDV grouping really is big and must NOT be
 * broadcast. The NDV sketch is exactly the statistic that separates the
 * two — this is the same reasoning Spark's own CBO applies when ANALYZE
 * TABLE column stats exist; graft tables live outside the session
 * catalog, so the engine carries the stats and injects the decision.
 *
 * Mechanics: [[NdvBroadcastRule]] (injected by [[GraftExtensions]])
 * matches un-hinted joins whose side is an `Aggregate` grouping on
 * columns with registered NDVs, all of whose scans belong to the
 * analyzed table's directory. Estimated output bytes =
 * min(Π ndv(groupCols), rowCount) × row width; a side under the
 * session's `autoBroadcastJoinThreshold` gets a BROADCAST hint on the
 * JOIN node (never a plan rewrite — Spark's JoinSelection still owns
 * the strategy, the stats only inform it). Both sides qualifying →
 * the smaller estimate wins. Results are never affected — only the
 * physical strategy (PlanAuditSpec pins the flip and the equality).
 */
object NdvStats {

  /** Per-table stats: column → estimated NDV, plus live row count. */
  final case class TableStats(ndv: Map[String, Long], rows: Long)

  /** table directory (the warehouse `<wh>/<table>` path) → stats.
    * Registered by analyzeTable and re-registered by getTable when the
    * metadata carries stats, so a reopened warehouse feeds the planner
    * without re-analyzing. */
  private val registry = TrieMap.empty[String, TableStats]

  def register(tableDir: String, stats: TableStats): Unit =
    registry(tableDir) = stats

  def lookup(tableDir: String): Option[TableStats] = registry.get(tableDir)

  /** The registered table whose directory contains EVERY scan root of
    * `plan` — i.e. the plan reads only this table's files (base, tail,
    * projections), so its stats describe the plan's input. */
  private[plans] def statsForPlan(plan: LogicalPlan): Option[TableStats] = {
    val roots = plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    if (roots.isEmpty) None
    else {
      val owners = roots.map(r => registry.keys.find(d => r.startsWith(d + "/")))
      if (owners.forall(_.isDefined) && owners.flatten.distinct.size == 1)
        registry.get(owners.head.get)
      else None
    }
  }
}

/** The optimizer rule: see [[NdvStats]]. */
object NdvBroadcastRule extends Rule[LogicalPlan] {

  /** Estimated materialized bytes of an aggregate side, when every
    * grouping key has a registered NDV. Width is the schema default
    * size + per-row object overhead (the same coarse arithmetic Spark's
    * size estimation uses — the decision needs orders of magnitude,
    * not precision). */
  private def estimateBytes(side: LogicalPlan): Option[Long] = side match {
    case agg @ Aggregate(groupExprs, _, child, _)
        if groupExprs.nonEmpty && groupExprs.forall(_.isInstanceOf[Attribute]) =>
      NdvStats.statsForPlan(child).flatMap { st =>
        val names = groupExprs.map(_.asInstanceOf[Attribute].name)
        if (names.forall(st.ndv.contains)) {
          val rows = names.map(st.ndv).product.min(st.rows.max(1L))
          val width = agg.output.map(_.dataType.defaultSize).sum + 8
          Some(rows * width)
        } else None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join if j.hint == JoinHint.NONE =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      if (threshold <= 0) j
      else {
        val l = estimateBytes(j.left).filter(_ <= threshold)
        val r = estimateBytes(j.right).filter(_ <= threshold)
        (l, r) match {
          case (Some(lb), Some(rb)) =>
            if (lb <= rb) j.copy(hint = JoinHint(
              Some(HintInfo(strategy = Some(BROADCAST))), None))
            else j.copy(hint = JoinHint(None,
              Some(HintInfo(strategy = Some(BROADCAST)))))
          case (Some(_), None) => j.copy(hint = JoinHint(
            Some(HintInfo(strategy = Some(BROADCAST))), None))
          case (None, Some(_)) => j.copy(hint = JoinHint(None,
            Some(HintInfo(strategy = Some(BROADCAST)))))
          case _ => j
        }
      }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, EqualNullSafe, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Candidate-partition semi-join pushdown through windows.
 *
 * A predicate on a non-partition column can never be pushed below a window
 * (the window's functions see whole partitions; dropping rows first would
 * corrupt them — for the lineage snapshot window, an old version's value
 * must not decide a record's fate). So `snapshot.where(secondary = x)`
 * normally windows the ENTIRE table and filters afterwards.
 *
 * But a partition can contribute a surviving output row only if SOME input
 * row of that partition satisfies the predicate (any output row that
 * passes the filter carries pass-through column values of one of its
 * partition's input rows). So it is always safe to pre-restrict the window
 * input to partitions with ≥1 matching row:
 *
 *   Filter(p, Window(child))
 *     ⇒ Filter(p, Window(child ⋉ Distinct(σ_p(child).select(keys))))
 *
 * The kept partitions are retained WHOLE, so window function values are
 * unchanged; the outer filter still runs, so no false positives. The
 * candidate scan is column-pruned with `p` pushed to parquet; the window's
 * shuffle+sort shrinks from the whole table to the candidate partitions.
 * This generalizes [[graft.core.LineageTable.probe]] (the reference's
 * Index.locate → select composition, lstore/index.py:242) to ANY filter
 * over ANY partitioned window, applied automatically via
 * [[GraftExtensions]].
 *
 * The injection point is the BOTTOM of the window chain: the rule descends
 * through stacked Windows partitioned by the same keys (a snapshot is two
 * — row_number and count), Projects, and Filters — all of which preserve
 * whole partitions or act row-wise — and semi-joins the deepest scan-shaped
 * node, so every window above computes only candidate partitions.
 *
 * Applicability guards: deterministic conjuncts only, references must be
 * pass-through child attributes, predicates on the partition keys alone
 * are skipped (Catalyst pushes those below the window natively), and a
 * bottom that is already a LeftSemi join is left alone (idempotence under
 * the fixed-point optimizer batch). Two containment guards keep the
 * rewrite linear: (1) conjuncts touching the engine's lineage metadata
 * columns (`_ver`/`_del` — present above every snapshot window and wholly
 * unselective) never count as probes; (2) the bottom must be scan-shaped
 * (no nested Window/Aggregate/Join), so the candidate side duplicates
 * scans, never operator pipelines — un-cached multi-op lineage chains keep
 * their plain plan, while the at-scale shapes (tables read from storage,
 * or a cached lineage collapsed to InMemoryRelation) all qualify.
 */
object WindowProbeRule extends Rule[LogicalPlan] with PredicateHelper {

  /** graft lineage metadata columns — never probe-worthy. */
  private val metaCols = Set("_ver", "_del")

  private def scanShaped(p: LogicalPlan): Boolean =
    p.collectFirst {
      case _: Window => ()
      case _: Aggregate => ()
      case _: Join => ()
    }.isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      val keyAttrs = w.partitionSpec.map(_.asInstanceOf[Attribute])
      val keySet = AttributeSet(keyAttrs)
      val pushable = splitConjunctivePredicates(cond).filter { c =>
        c.deterministic && c.references.nonEmpty &&
          c.references.subsetOf(w.child.outputSet) &&
          !c.references.subsetOf(keySet) &&
          !c.references.exists(a => metaCols(a.name))
      }
      if (pushable.isEmpty) f
      else inject(w.child, keyAttrs, keySet, pushable) match {
        case Some(newChild) => Filter(cond, w.copy(child = newChild))
        case None => f
      }
  }

  /** Descend through partition-preserving nodes; semi-join the bottom. */
  private def inject(p: LogicalPlan, keyAttrs: Seq[Attribute], keySet: AttributeSet,
                     pushable: Seq[Expression]): Option[LogicalPlan] = p match {
    case win: Window
        if AttributeSet(win.partitionSpec.flatMap(_.references)) == keySet =>
      inject(win.child, keyAttrs, keySet, pushable).map(c => win.copy(child = c))
    case proj: Project =>
      inject(proj.child, keyAttrs, keySet, pushable).map(c => proj.copy(child = c))
    case flt: Filter =>
      inject(flt.child, keyAttrs, keySet, pushable).map(c => flt.copy(child = c))
    case j: Join if j.joinType == LeftSemi => None // already probed
    case b if scanShaped(b) &&
        AttributeSet(pushable.flatMap(_.references)).subsetOf(b.outputSet) &&
        keySet.subsetOf(b.outputSet) =>
      // Distinct candidate keys under FRESH attribute ids (the join's two
      // sides must expose disjoint outputs).
      val aliases = keyAttrs.map(a => Alias(a, a.name)())
      val candidates = Aggregate(keyAttrs, aliases, Filter(pushable.reduce(And), b))
      // null-SAFE equality: window partitioning groups NULL keys into one
      // partition, so a null-keyed partition with a matching row must
      // survive the semi-join — plain EqualTo would drop it
      val joinCond = keyAttrs.zip(candidates.output)
        .map { case (l, r) => EqualNullSafe(l, r) }
        .reduceLeft[Expression](And(_, _))
      Some(Join(b, candidates, LeftSemi, Some(joinCond), JoinHint.NONE))
    case _ => None
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` activates the
  * engine's Catalyst extensions for a session: the window-probe
  * optimizer rule above, plus the engine's native expressions registered
  * as SQL functions — the SQL front door reaches the same codegen'd
  * primitives the Column API uses (`graft_dot` for similarity,
  * `graft_kmv` for distinct sketches), so a pure-SQL user pays no
  * interpreter penalty vs the Scala surface. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => WindowProbeRule)
    e.injectOptimizerRule(_ => NdvBroadcastRule)
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_dot(a, b) takes exactly two array<float> arguments")
        graft.functions.DotProduct(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[graft.functions.KMinValues].getName, "graft_kmv"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_kmv(h, k) takes a bigint column and a literal k")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) if v.isValidInt => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an integer literal, got $other")
        }
        graft.functions.KMinValues(args.head, k).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("graft_freq"),
      new ExpressionInfo(classOf[graft.functions.FrequentItems].getName,
        "graft_freq"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_freq(s, k) takes a string column and a literal k")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) if v.isValidInt => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_freq k must be an integer literal, got $other")
        }
        graft.functions.FrequentItems(args.head, k).toAggregateExpression()
      }))
  }
}

package graft.ir

import graft.graph.Direction

/** Shared logical IR — the single intermediate representation every query
  * language front-end compiles into, mirroring the reference's
  * `LogicalOperator` / `LogicalExpression` enums
  * (crates/grafeo-engine/src/query/plan.rs:25-155, :862-968) re-shaped as
  * Scala ADTs. The compiler (graft.compiler.Compiler) lowers this IR to a
  * DataFrame plan, replacing the reference's planner.rs with Catalyst.
  */
object Expr {
  sealed trait E
  final case class Lit(v: Any) extends E
  final case class Var(name: String) extends E
  final case class Prop(v: String, key: String) extends E
  final case class Func(name: String, args: Seq[E], distinct: Boolean = false) extends E
  final case class Bin(op: String, l: E, r: E) extends E
  final case class Not(e: E) extends E
  final case class Neg(e: E) extends E
  final case class IsNull(e: E, negated: Boolean) extends E
  final case class ListLit(items: Seq[E]) extends E
  final case class CaseW(branches: Seq[(E, E)], orElse: Option[E]) extends E
  final case class Param(name: String) extends E
  /** List comprehension `[v IN list WHERE p | m]` (ref cypher ast.rs:429) —
    * lowers onto Spark's filter/transform higher-order functions.
    */
  final case class ListComp(v: String, list: E, where: Option[E], map: Option[E]) extends E
  /** Quantified list predicate `all/any/none/single(v IN list WHERE p)`
    * (ref cypher ast.rs:429 quantifier forms) — lowers onto Spark's
    * forall/exists higher-order functions.
    */
  final case class Quant(kind: String, v: String, list: E, pred: E) extends E
  /** `reduce(acc = init, v IN list | step)` — lowers onto Spark's
    * `aggregate` higher-order function.
    */
  final case class Reduce(acc: String, init: E, v: String, list: E, step: E) extends E
  /** 0-based index / slice access (ref cypher plan.rs:912-925). */
  final case class Idx(list: E, i: E) extends E
  final case class Slice(list: E, from: Option[E], to: Option[E]) extends E
  final case class MapLit(items: Seq[(String, E)]) extends E
  /** In-language EXISTS / COUNT subqueries (ref cypher ast.rs:460): the
    * embedded plan correlates with the outer query on shared variable
    * columns; translate eliminates these into semi/anti joins and
    * correlated-count joins before compilation.
    */
  final case class ExistsSub(plan: Op.T) extends E
  final case class CountSub(plan: Op.T) extends E
  /** Pattern comprehension (ref cypher ast.rs:440): per outer row, the list
    * of `item` values over the sub-plan's correlated matches. Eliminated into
    * [[Op.CorrelatedCollect]] before compilation.
    */
  final case class CollectSub(plan: Op.T, item: E) extends E

  /** Aggregate function names (plan.rs:285-308; aggregate.rs:48-75;
    * group_concat/sample are the SPARQL 1.1 additions).
    */
  val aggregateFns: Set[String] =
    Set("count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
      "percentilecont", "percentiledisc", "group_concat", "sample")

  /** Bottom-up expression rewrite (parameter substitution, path-length
    * resolution). `f` sees each node after its children were rewritten.
    */
  def rewrite(e: E)(f: E => E): E = {
    val r: E = e match {
      case Func(n, args, d)  => Func(n, args.map(rewrite(_)(f)), d)
      case Bin(op, l, rr)    => Bin(op, rewrite(l)(f), rewrite(rr)(f))
      case Not(x)            => Not(rewrite(x)(f))
      case Neg(x)            => Neg(rewrite(x)(f))
      case IsNull(x, ng)     => IsNull(rewrite(x)(f), ng)
      case ListLit(items)    => ListLit(items.map(rewrite(_)(f)))
      case CaseW(bs, oe)     => CaseW(bs.map { case (c, v) =>
        (rewrite(c)(f), rewrite(v)(f)) }, oe.map(rewrite(_)(f)))
      case ListComp(v, l, w, m) =>
        ListComp(v, rewrite(l)(f), w.map(rewrite(_)(f)), m.map(rewrite(_)(f)))
      case Quant(k, v, l, p) => Quant(k, v, rewrite(l)(f), rewrite(p)(f))
      case Reduce(a, i0, v, l, s) =>
        Reduce(a, rewrite(i0)(f), v, rewrite(l)(f), rewrite(s)(f))
      case Idx(l, i)         => Idx(rewrite(l)(f), rewrite(i)(f))
      case Slice(l, a, b)    => Slice(rewrite(l)(f), a.map(rewrite(_)(f)), b.map(rewrite(_)(f)))
      case MapLit(items)     => MapLit(items.map { case (k, v) => (k, rewrite(v)(f)) })
      case ExistsSub(p)      => ExistsSub(Op.rewriteExprs(p)(f))
      case CountSub(p)       => CountSub(Op.rewriteExprs(p)(f))
      case CollectSub(p, it) => CollectSub(Op.rewriteExprs(p)(f), rewrite(it)(f))
      case leaf => leaf
    }
    f(r)
  }

  def containsAggregate(e: E): Boolean = e match {
    case Func(n, args, _) =>
      aggregateFns.contains(n.toLowerCase) || args.exists(containsAggregate)
    case Bin(_, l, r)   => containsAggregate(l) || containsAggregate(r)
    case Not(x)         => containsAggregate(x)
    case Neg(x)         => containsAggregate(x)
    case IsNull(x, _)   => containsAggregate(x)
    case ListLit(items) => items.exists(containsAggregate)
    case CaseW(bs, e2) =>
      bs.exists(b => containsAggregate(b._1) || containsAggregate(b._2)) ||
        e2.exists(containsAggregate)
    case ListComp(_, l, w, m) =>
      containsAggregate(l) || w.exists(containsAggregate) || m.exists(containsAggregate)
    case Quant(_, _, l, p)  => containsAggregate(l) || containsAggregate(p)
    case Reduce(_, i0, _, l, s) =>
      containsAggregate(i0) || containsAggregate(l) || containsAggregate(s)
    case Idx(l, i)      => containsAggregate(l) || containsAggregate(i)
    case Slice(l, a, b) =>
      containsAggregate(l) || a.exists(containsAggregate) || b.exists(containsAggregate)
    case MapLit(items)  => items.exists(kv => containsAggregate(kv._2))
    // ExistsSub/CountSub are per-row scalars over their own plan, not
    // aggregates of the outer rows
    case _ => false
  }
}

object Op {
  import Expr.E

  sealed trait T

  /** plan.rs:157-166 — scan nodes, optional label filter. */
  final case class NodeScan(v: String, label: Option[String]) extends T

  /** plan.rs:180-212 — 1-hop traversal; targetLabel prunes the far side;
    * edgeVar (when bound) exposes the edge's type/properties as columns.
    * `relTypes` empty = any type; several = alternation (Cypher `[:A|B]`,
    * Gremlin `out('A','B')` — the reference keeps a type list on its
    * RelationshipPattern).
    */
  final case class Expand(input: T, from: String, relTypes: Seq[String],
      to: String, dir: Direction, targetLabel: Option[String],
      edgeVar: Option[String] = None) extends T

  /** plan.rs:180-212 with min/max hops (variable_length_expand.rs);
    * `max < 0` = unbounded (`max_hops: Option`, plan.rs:195) — terminated by
    * the visited-set guard (variable_length_expand.rs:263). `hopsAs`
    * optionally binds the walk length (Cypher `length(p)` on a path-variable
    * var-length pattern); `pathAs` binds the full node-id walk as an
    * array<long> column (Cypher `nodes(p)`; Path value logical_type.rs:14-88).
    * `uniq` is the walk-uniqueness contract (variable_length_expand.rs
    * supports both via edge ids): "edges" = openCypher relationship-unique
    * walks (Cypher/GQL patterns), "nodes" = node-unique simple paths,
    * "none" = unconstrained walks (Gremlin repeat) — unbounded or path-bound
    * "none" walks fall back to node-unique for termination.
    */
  final case class VarExpand(input: T, from: String, relTypes: Seq[String],
      to: String, dir: Direction, min: Int, max: Int,
      targetLabel: Option[String], hopsAs: Option[String] = None,
      pathAs: Option[String] = None, uniq: String = "none") extends T

  /** plan.rs:311-317. */
  final case class Filter(input: T, pred: E) extends T

  /** plan.rs:320-335 — also SPARQL BIND / Cypher WITH. */
  final case class Project(input: T, items: Seq[(E, String)]) extends T

  /** plan.rs:256-307 — keys empty = global aggregate. */
  final case class Aggregate(input: T, keys: Seq[(E, String)],
      aggs: Seq[(E, String)]) extends T

  /** plan.rs:356-380. */
  final case class Sort(input: T, keys: Seq[(E, Boolean)]) extends T

  /** plan.rs:338-353. */
  final case class Limit(input: T, n: Long) extends T
  final case class Skip(input: T, n: Long) extends T

  /** plan.rs:383-390. */
  final case class Distinct(input: T) extends T

  /** plan.rs:506-510 — bag concat. */
  final case class UnionAll(l: T, r: T) extends T

  /** Natural join on shared variable columns (multi-MATCH / multi-path). */
  final case class NaturalJoin(l: T, r: T) extends T

  /** Left outer natural join (OPTIONAL MATCH; plan.rs:513-521). */
  final case class LeftNaturalJoin(l: T, r: T) extends T

  /** Semi/anti natural joins — what WHERE [NOT] EXISTS { … } subqueries
    * (ref cypher ast.rs:460) lower to: correlation is the shared variable
    * columns, so Catalyst executes a distributed hash semi-join instead of a
    * per-row subquery.
    */
  final case class SemiNaturalJoin(l: T, r: T) extends T
  final case class AntiNaturalJoin(l: T, r: T) extends T

  /** COUNT { … } subquery: left join against the sub-plan's per-key counts,
    * missing keys count 0. `as` is the bound output column.
    */
  final case class CorrelatedCount(input: T, sub: T, as: String) extends T

  /** Pattern comprehension (ref cypher ast.rs:440): left join against the
    * sub-plan's per-key collected `item` lists; rows with no match bind the
    * empty list. Lists are sorted — openCypher leaves comprehension order
    * unspecified, and sorting is the deterministic distributed choice.
    */
  final case class CorrelatedCollect(input: T, sub: T, item: E, as: String) extends T

  /** plan.rs:533-541 — bind an expression as a new column while keeping all
    * existing bindings (SPARQL BIND; Gremlin bothV/optional value rebinding).
    */
  final case class Bind(input: T, e: E, as: String) extends T

  /** plan.rs:544-555 — list to rows. */
  final case class Unwind(input: T, list: E, as: String) extends T

  /** ShortestPath (plan.rs:579-598; shortest_path.rs:18): for each binding
    * of `from`, the minimal-hop distance (1..maxHops) to every reachable
    * `to`; `lenAs` optionally binds the path length (Cypher `length(p)`).
    * `pathAs` binds the node-id walk of a minimal path (Cypher `nodes(p)`;
    * with `all` every minimal path, else one — lexicographically smallest —
    * per endpoint pair, the deterministic choice where openCypher says
    * "any").
    */
  final case class ShortestPath(input: T, from: String, relTypes: Seq[String],
      to: String, dir: Direction, maxHops: Int, targetLabel: Option[String],
      lenAs: Option[String], pathAs: Option[String] = None,
      all: Boolean = false) extends T

  /** SingleRowOperator (single_row.rs:18) — standalone RETURN/UNWIND. */
  case object OneRow extends T

  /** Rewrite every expression embedded in the plan with [[Expr.rewrite]] —
    * how parameters bind at translate time (reference processor.rs:417-600
    * substitutes params before planning).
    */
  def rewriteExprs(t: T)(f: Expr.E => Expr.E): T = {
    def rx(e: E): E = Expr.rewrite(e)(f)
    t match {
      case NodeScan(_, _) | OneRow => t
      case e: Expand       => e.copy(input = rewriteExprs(e.input)(f))
      case e: VarExpand    => e.copy(input = rewriteExprs(e.input)(f))
      case e: ShortestPath => e.copy(input = rewriteExprs(e.input)(f))
      case Filter(in, p)   => Filter(rewriteExprs(in)(f), rx(p))
      case Project(in, items) =>
        Project(rewriteExprs(in)(f), items.map { case (e, n) => (rx(e), n) })
      case Aggregate(in, ks, as2) =>
        Aggregate(rewriteExprs(in)(f),
          ks.map { case (e, n) => (rx(e), n) },
          as2.map { case (e, n) => (rx(e), n) })
      case Sort(in, ks) =>
        Sort(rewriteExprs(in)(f), ks.map { case (e, a) => (rx(e), a) })
      case Limit(in, n)    => Limit(rewriteExprs(in)(f), n)
      case Skip(in, n)     => Skip(rewriteExprs(in)(f), n)
      case Distinct(in)    => Distinct(rewriteExprs(in)(f))
      case UnionAll(l, r)  => UnionAll(rewriteExprs(l)(f), rewriteExprs(r)(f))
      case NaturalJoin(l, r) => NaturalJoin(rewriteExprs(l)(f), rewriteExprs(r)(f))
      case LeftNaturalJoin(l, r) =>
        LeftNaturalJoin(rewriteExprs(l)(f), rewriteExprs(r)(f))
      case SemiNaturalJoin(l, r) =>
        SemiNaturalJoin(rewriteExprs(l)(f), rewriteExprs(r)(f))
      case AntiNaturalJoin(l, r) =>
        AntiNaturalJoin(rewriteExprs(l)(f), rewriteExprs(r)(f))
      case CorrelatedCount(in, sub, a) =>
        CorrelatedCount(rewriteExprs(in)(f), rewriteExprs(sub)(f), a)
      case CorrelatedCollect(in, sub, it, a) =>
        CorrelatedCollect(rewriteExprs(in)(f), rewriteExprs(sub)(f), rx(it), a)
      case Bind(in, e, a)  => Bind(rewriteExprs(in)(f), rx(e), a)
      case Unwind(in, l, a) => Unwind(rewriteExprs(in)(f), rx(l), a)
    }
  }
}

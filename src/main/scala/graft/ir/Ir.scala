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

  /** Aggregate function names (plan.rs:285-308; aggregate.rs:48-75). */
  val aggregateFns: Set[String] =
    Set("count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
      "percentilecont", "percentiledisc")

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
    */
  final case class Expand(input: T, from: String, relType: Option[String],
      to: String, dir: Direction, targetLabel: Option[String],
      edgeVar: Option[String] = None) extends T

  /** plan.rs:180-212 with min/max hops (variable_length_expand.rs). */
  final case class VarExpand(input: T, from: String, relType: Option[String],
      to: String, dir: Direction, min: Int, max: Int,
      targetLabel: Option[String]) extends T

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

  /** plan.rs:544-555 — list to rows. */
  final case class Unwind(input: T, list: E, as: String) extends T

  /** ShortestPath (plan.rs:579-598; shortest_path.rs:18): for each binding
    * of `from`, the minimal-hop distance (1..maxHops) to every reachable
    * `to`; `lenAs` optionally binds the path length (Cypher `length(p)`).
    */
  final case class ShortestPath(input: T, from: String, relType: Option[String],
      to: String, dir: Direction, maxHops: Int, targetLabel: Option[String],
      lenAs: Option[String]) extends T

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
      case Unwind(in, l, a) => Unwind(rewriteExprs(in)(f), rx(l), a)
    }
  }
}

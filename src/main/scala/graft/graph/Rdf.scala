package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** RDF triple model (SURVEY.md §1.4; reference RdfStore
  * crates/grafeo-core/src/graph/rdf/store.rs:58-71).
  *
  * One `triples(s, p, o)` DataFrame. The reference's SPO/POS/OSP hash indexes
  * are replaced by predicate pushdown on the scan — at scale, partitioning by
  * `p` (vertical partitioning) keeps each BGP leg a pruned scan.
  */
sealed trait Term
final case class V(name: String) extends Term    // variable
final case class L(value: String) extends Term   // literal / IRI

final case class TriplePattern(s: Term, p: Term, o: Term)

final case class TripleGraph(triples: DataFrame) {

  /** Basic graph pattern matching (TripleScan plan.rs:480-503 + the RDF
    * planner's BGP joins, planner_rdf.rs): each pattern filters the triple
    * table on its bound components; patterns are chained with natural joins
    * on shared variables (cross join when disjoint). Output: one column per
    * distinct variable.
    */
  def bgp(patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    def leg(pat: TriplePattern): DataFrame = {
      val bound = Seq("s" -> pat.s, "p" -> pat.p, "o" -> pat.o)
      val filtered = bound.foldLeft(triples) {
        case (df, (c, L(v))) => df.filter(col(c) === v)
        case (df, _)         => df
      }
      // project variables; a variable repeated inside one pattern adds an
      // equality filter rather than a duplicate column
      val varCols = bound.collect { case (c, V(n)) => (c, n) }
      val dup = varCols.groupBy(_._2).filter(_._2.size > 1)
      val eq = dup.values.flatMap(g => g.tail.map(t => col(g.head._1) === col(t._1)))
      val f2 = eq.foldLeft(filtered)(_ filter _)
      f2.select(varCols.map(_._2).distinct.map(n =>
        col(varCols.find(_._2 == n).get._1).as(n)): _*)
    }
    patterns.map(leg).reduceLeft { (acc, next) =>
      val shared = acc.columns.intersect(next.columns).toSeq
      if (shared.nonEmpty) acc.join(next, shared) else acc.crossJoin(next)
    }
  }

  /** SPARQL INSERT DATA (plan.rs:603-614): RDF graphs are sets — union +
    * dedup against the existing store.
    */
  def insertData(rows: DataFrame): TripleGraph =
    TripleGraph(triples.unionByName(rows.select("s", "p", "o")).distinct())

  /** SPARQL DELETE WHERE with a single pattern (plan.rs:617-628): remove
    * every triple matching the bound components.
    */
  def deleteWhere(pattern: TriplePattern): TripleGraph = {
    val cond = Seq("s" -> pattern.s, "p" -> pattern.p, "o" -> pattern.o)
      .collect { case (c, L(v)) => col(c) === v }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    TripleGraph(triples.filter(!cond))
  }

  /** SPARQL Modify — DELETE … INSERT … WHERE … (plan.rs:631-663): the WHERE
    * bindings are evaluated ONCE, then both templates are instantiated from
    * the same binding set (delete first, then insert — the reference's
    * documented order).
    */
  def modify(where: Seq[TriplePattern], deleteTpl: Seq[TriplePattern],
      insertTpl: Seq[TriplePattern]): TripleGraph =
    modifyWithDelta(where, deleteTpl, insertTpl)._1

  /** [[modify]] plus the EXACT change sets the operation induces —
    * the SPARQL-update→CDC primitive: the delta frames feed
    * [[graft.sources.GraphIO.Epochs.commitTriplesDelta]] directly, so an
    * update's epoch commit writes O(changed rows) with no corpus
    * anti-join (the templates instantiated over the WHERE bindings
    * already name every candidate row; membership against the store
    * reduces them to the true delta).
    *
    * With final = (T − D) ∪ I:  adds = I − T (inserted and not already
    * present); removes = (D ∩ T) − I (present, deleted, not re-inserted).
    *
    * The returned delta frames are BAGS: a template instantiated from
    * multiple bindings can repeat a row (deduping each here would cost an
    * exchange per side; [[graft.sources.GraphIO.Epochs.commitTriplesDelta]]
    * dedups once on the tagged union). Callers needing sets apply
    * `.distinct()` themselves.
    */
  def modifyWithDelta(where: Seq[TriplePattern], deleteTpl: Seq[TriplePattern],
      insertTpl: Seq[TriplePattern]): (TripleGraph, DataFrame, DataFrame) = {
    // persist only multi-leg WHEREs: a single-pattern binding set is one
    // pruned scan — re-evaluating it per consumer costs the same as a
    // cache read and skips the materialization stage (measured 2 jobs per
    // delta commit); a join-shaped BGP is real compute, evaluated once
    val bindings =
      if (where.size > 1) bgp(where).persist() else bgp(where)
    def instantiate(tpl: TriplePattern): DataFrame = {
      def term(t: Term): Column = t match {
        case V(n) => col(n).cast("string")
        case L(v) => lit(v)
      }
      bindings.select(term(tpl.s).as("s"), term(tpl.p).as("p"), term(tpl.o).as("o"))
    }
    val key = Seq("s", "p", "o")
    val empty = triples.select(col("s"), col("p"), col("o")).limit(0)
    // no per-template distinct: anti/semi-join right sides dedup
    // inherently, and `after`'s terminal distinct covers the insert union
    // — each distinct here would cost its own exchange (a whole AQE stage
    // on a tiny frame; measured as the job-count floor of delta commits)
    val toDelete = deleteTpl.map(instantiate).reduceOption(_ unionByName _)
    val toInsert = insertTpl.map(instantiate).reduceOption(_ unionByName _)
    val afterDelete = toDelete match {
      case Some(d) => triples.join(d, key, "left_anti")
      case None => triples
    }
    val after = toInsert match {
      case Some(ins) => afterDelete.unionByName(ins).distinct()
      case None => afterDelete
    }
    // The presence checks behind `adds`/`removes` prune the STORE side by
    // each template's literal terms before joining: every instantiated row
    // carries exactly those literals, so store rows with any other value
    // in a literal position can never match — the filter is
    // answer-preserving, reaches the parquet scan (PushedFilters), and
    // shrinks the join's store side from the corpus to the matched slice
    // (usually broadcast-size). Without it each delta commit shuffled the
    // FULL store twice — the measured O(store) term that dominated the
    // epoch family's sf10 decade (r17; e0's one-time snapshot write is
    // then the only super-constant cost left).
    def litPred(tpl: TriplePattern): Column =
      Seq(tpl.s -> "s", tpl.p -> "p", tpl.o -> "o").collect {
        case (L(v), c) => col(c) === lit(v)
      }.reduceOption(_ && _).getOrElse(lit(true))
    val adds = insertTpl.map { tpl =>
      instantiate(tpl).join(
        triples.filter(litPred(tpl)).select(key.map(col): _*), key, "left_anti")
    }.reduceOption(_ unionByName _).getOrElse(empty)
    val removes = deleteTpl.map { tpl =>
      val present = instantiate(tpl).join(
        triples.filter(litPred(tpl)).select(key.map(col): _*), key, "left_semi")
      toInsert.map(i => present.join(i, key, "left_anti")).getOrElse(present)
    }.reduceOption(_ unionByName _).getOrElse(empty)
    (TripleGraph(after), adds, removes)
  }
}

/** Deterministic triple view of the TPC-H tables (oracle-friendly: every
  * derived triple is a plain SQL projection of a base table).
  */
object TpchRdf {

  /** TpchRdf plus region and part-tree triples for property-path queries
    * (ref sparql/ast.rs:388-414): `n:<k> inRegion r:<k>` chains onto
    * inNation for `/` sequences, and `pt:k child pt:2k / pt:2k+1` is a
    * binary tree whose transitive closure is n·log n pairs with log-n
    * depth — bounded at any scale factor.
    */
  def withPaths(spark: SparkSession, dir: String): TripleGraph = {
    val base = apply(spark, dir).triples
    val n = Tables.nation(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey").as("k"))
    val p2 = p.select(col("k").as("k2"))
    def tree(cond: Column): DataFrame =
      p.join(p2, cond).select(
        concat(lit("pt:"), col("k")).as("s"),
        lit("child").as("p"),
        concat(lit("pt:"), col("k2")).as("o"))
    val more = n.select(
        concat(lit("n:"), col("n_nationkey")).as("s"),
        lit("inRegion").as("p"),
        concat(lit("r:"), col("n_regionkey")).as("o"))
      .unionByName(tree(col("k2") === col("k") * 2))
      .unionByName(tree(col("k2") === col("k") * 2 + 1))
    TripleGraph(base.unionByName(more))
  }

  /** TpchRdf plus typed date literals — `o:<k> odate '<date>^^xsd:date'` —
    * exercising the typed-literal suffix encoding (lang `@tag` / datatype
    * `^^type`) that DATATYPE/STR/YEAR strip or inspect.
    */
  def withDates(spark: SparkSession, dir: String): TripleGraph = {
    val base = apply(spark, dir).triples
    val o = Tables.orders(spark, dir)
    val dates = o.select(
      concat(lit("o:"), col("o_orderkey")).as("s"),
      lit("odate").as("p"),
      // the parquet column is TIMESTAMP; an xsd:date literal is the date part
      concat(col("o_orderdate").cast("date").cast("string"), lit("^^xsd:date")).as("o"))
    TripleGraph(base.unionByName(dates))
  }

  /** TpchRdf plus `rdf:type` triples (the `a` keyword's target) — kept as a
    * separate view so existing oracles over the base view stay unchanged.
    */
  def withTypes(spark: SparkSession, dir: String): TripleGraph = {
    val base = apply(spark, dir).triples
    def ty(df: DataFrame, s: Column, cls: String): DataFrame =
      df.select(s.cast("string").as("s"), lit("rdf:type").as("p"), lit(cls).as("o"))
    val types =
      ty(Tables.customer(spark, dir), concat(lit("c:"), col("c_custkey")), "Customer")
        .unionByName(ty(Tables.nation(spark, dir), concat(lit("n:"), col("n_nationkey")), "Nation"))
        .unionByName(ty(Tables.supplier(spark, dir), concat(lit("s:"), col("s_suppkey")), "Supplier"))
    TripleGraph(base.unionByName(types))
  }

  def apply(spark: SparkSession, dir: String): TripleGraph = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val sup = Tables.supplier(spark, dir)
    def t(df: DataFrame, s: Column, p: String, o: Column): DataFrame =
      df.select(s.cast("string").as("s"), lit(p).as("p"), o.cast("string").as("o"))
    val triples =
      t(c, concat(lit("c:"), col("c_custkey")), "name", col("c_name"))
        .unionByName(t(c, concat(lit("c:"), col("c_custkey")), "segment", col("c_mktsegment")))
        .unionByName(t(c, concat(lit("c:"), col("c_custkey")), "inNation", concat(lit("n:"), col("c_nationkey"))))
        .unionByName(t(n, concat(lit("n:"), col("n_nationkey")), "name", col("n_name")))
        .unionByName(t(sup, concat(lit("s:"), col("s_suppkey")), "name", col("s_name")))
        .unionByName(t(sup, concat(lit("s:"), col("s_suppkey")), "inNation", concat(lit("n:"), col("s_nationkey"))))
    TripleGraph(triples)
  }
}

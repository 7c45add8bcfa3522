package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Plan-shape assertions — the 100 TB contract: filters and projections must
  * reach the parquet scan, small dimensions must broadcast, ordered limits
  * must not global-sort. These guard against regressions that correctness
  * checks cannot see.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    Catalog.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filter and projection push down to the parquet scan") {
    val p = plan("q_scan_filter")
    assert(p.contains("PushedFilters:"), "expected parquet PushedFilters")
    assert(p.contains("c_mktsegment"), "segment filter should reach the scan")
    // column pruning: the untouched column must not be read
    assert(p.contains("ReadSchema"))
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("c_nationkey"),
      "pruned column c_nationkey must not be in ReadSchema")
  }

  test("dimension joins broadcast") {
    val p = plan("q_join_inner")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$p")
    assert(!p.contains("SortMergeJoin"), "small dims must not sort-merge")
  }

  test("AQE broadcasts TPC-H dimension joins without explicit hints") {
    // CBO-hardening evidence (the 100× contract): the catalog's TPC-H
    // queries hand-place broadcast() on nation/region/supplier, but the
    // join order must not DEPEND on the hints — file-based tables carry no
    // ANALYZE stats (spark.sql.cbo applies to catalog tables), so the
    // at-scale guarantee is AQE's runtime size-based re-plan. Build the q5
    // join chain hint-free and assert the finalized adaptive plan still
    // broadcasts the dims.
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    val df = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(sum("c_acctbal").as("bal"))
    df.collect() // AQE finalizes the physical plan only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), s"AQE off?\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join sort-merged:\n$p")
  }

  test("rel-var re-binding joins on eid — no cartesian product") {
    // the two patterns share no node variables, so the naive plan is a
    // cross join + eid filter; Catalyst must rewrite it to an equi-join
    val df = Catalog.queries("q_cypher_rel_rebind")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"eid filter not pushed into join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"eid join degenerated:\n$p")
  }

  test("ordered limit uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_limit_skip")
    assert(p.contains("TakeOrderedAndProject"), s"got:\n$p")
  }

  test("aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
    assert(p.toLowerCase.contains("partial"),
      "expected partial aggregation before exchange")
  }

  test("expand compiles to joins with the filter pushed below") {
    val p = plan("q_expand_1hop")
    assert(p.contains("PushedFilters") || p.contains("Filter"))
    assert(!p.contains("CartesianProduct"), "expand must never cross-join")
  }

  test("embedding near-dup runs the bucketed plan — no all-pairs join") {
    val df = Catalog.queries("q_embed_neardup")(spark, sf)
    df.collect() // AQE finalizes the physical plan only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"all-pairs cross join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$p")
  }

  test("LSH k-NN candidate generation is an equi-join on buckets") {
    val df = Catalog.queries("q_knn_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"all-pairs cross join in:\n$p")
  }

  test("cyclic-pattern triangle query: the part-id filter reaches the scans") {
    val df = Catalog.queries("q_cypher_triangle")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cycle join must stay equi-join:\n$p")
    assert(p.contains("PushedFilters"), "expected pushed filters on the scans")
  }

  test("EXISTS subquery compiles to a semi join, COUNT to an aggregate join") {
    val df = Catalog.queries("q_cypher_exists")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"expected semi join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("minhash exact-dup uses a single full-signature band") {
    val df = Catalog.queries("q_minhash_exactdup")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be an equi-join:\n$p")
  }

  test("scalar quantization prunes to the embedding column") {
    val df = Catalog.queries("q_vector_quantize")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"))
    // the codebook aggregation and encode pass need only vec_id + embedding;
    // the unused `label` column must not appear in any scan schema
    p.split("ReadSchema").drop(1).foreach { seg =>
      assert(!seg.split("\n")(0).contains("label"),
        "pruned column `label` must not be in ReadSchema")
    }
  }

  test("factorized walk aggregate never materializes the walk cross-product") {
    val df = Catalog.queries("q_factorized_agg")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // no explode, and every hop joins against an already-aggregated frame —
    // the plan must interleave joins with HashAggregates, not stack 3 joins
    assert(!p.contains("Generate"), "factorized plan must not explode")
    val firstJoin = p.indexOf("Join")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstJoin >= 0 && firstAgg >= 0)
    assert(p.contains("HashAggregate"), s"expected aggregates between hops:\n$p")
  }

  test("constant GRAPH pattern pushes the graph-name filter to the scan") {
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val df = graft.frontends.sparql.SparqlFrontend.run(
      graft.graph.TripleGraph(store.quads.select("s", "p", "o")),
      "SELECT ?s WHERE { GRAPH src0 { ?s lang ?l } } ORDER BY ?s", store)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("src0"),
      s"graph-name filter must reach the quad scan:\n$p")
  }

  test("pattern predicate compiles to semi/anti joins, not per-row subqueries") {
    val df = Catalog.queries("q_cypher_pattern_pred")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"positive pattern must semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT pattern must anti-join:\n$p")
  }

  test("dynamic-props query: no cartesian, map access stays in projection") {
    val p = plan("q_dynamic_props")
    assert(!p.contains("CartesianProduct"), s"no all-pairs in:\n$p")
    // the dynamic keys are read via element_at over the map column
    assert(p.contains("props"), s"props map column expected in:\n$p")
  }

  test("unbounded path query plans carry no cartesian product") {
    val p = plan("q_cypher_varlen_unbounded")
    assert(!p.contains("CartesianProduct"), s"no all-pairs in:\n$p")
  }

  test("whole-stage codegen covers the relational pipeline") {
    // AQE prints the final (codegen'd) stages only after execution
    val df = Catalog.queries("q_project_expr")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), s"got:\n$p")
  }

  test("deterministic sampling evaluates in the scan stage, text never read") {
    val p = plan("q_sample")
    // the hash-bucket predicate is a pure column expression: it runs
    // inside the scan's filter (DataFilters), costs no shuffle, and the
    // wide text column is pruned from the read entirely
    assert(p.split("DataFilters")(1).split("\n")(0).contains("pmod"),
      s"hash filter should evaluate in the scan stage:\n$p")
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("text"),
      "text column must be pruned from the sampling scan")
  }

  test("tf-idf broadcasts the document-frequency table") {
    val p = plan("q_tfidf")
    assert(p.contains("BroadcastHashJoin"),
      s"idf table should broadcast, not shuffle the token table:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("vocabulary top-k partial-aggregates and take-orders") {
    val p = plan("q_vocab_topk")
    // two-phase aggregation: the map side combines term counts before the
    // exchange, and the k-row result is a TakeOrdered, never a global sort
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected partial aggregation before the exchange:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must take-order, not global-sort:\n$p")
  }

  test("sequence packing is one window pass, text never read past token count") {
    val p = plan("q_seq_packing")
    // exactly one window operator (the cumulative token sum)
    assert("(?m)^.*Window".r.findAllIn(p).size >= 1, s"expected a window:\n$p")
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("lang"),
      "untouched columns must be pruned from the packing scan")
  }

  test("sharded packing partitions its window by shard — no single-partition exchange") {
    val p = plan("q_seq_packing_sharded")
    assert(!p.contains("Exchange SinglePartition"),
      s"sharded packing must never funnel the corpus through one task:\n$p")
    assert(p.contains("hashpartitioning"),
      s"the per-shard window should shuffle by shard key:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the shard-offset table must broadcast:\n$p")
  }

  test("embedding cluster assignment broadcasts the centroid table") {
    val p = plan("q_embed_cluster")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 8-centroid table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      "corpus x centroids must never be a partitioned cartesian")
  }
}

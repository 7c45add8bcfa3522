package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Louvain community detection, distributed phase-1 (reference
  * community.rs:157): synchronous label optimization — every node adopts the
  * neighboring community with the best modularity gain
  * ΔQ ∝ w(i→C) − k_i·Σtot(C)/(2m), ties broken on the lowest community id,
  * for a fixed number of rounds or until stable.
  *
  * Each round is three joins + two aggregations over the edge list — the
  * 100 TB shape (no per-node sequential scan like the classic algorithm);
  * determinism comes from the synchronous update + total tie-break.
  */
object Louvain {

  def run(g: PropertyGraph, maxIters: Int = 10): DataFrame = {
    // undirected weighted adjacency
    val und = g.edges
      .select(col("src"), col("dst"), coalesce(col("weight"), lit(1.0)).as("w"))
      .unionByName(g.edges.select(col("dst").as("src"), col("src").as("dst"),
        coalesce(col("weight"), lit(1.0)).as("w")))
      .persist()
    // Adaptive strategy: broadcast-sized graphs run every round in one job
    // with the identical gain/tie-break rule (LocalGraph.louvain) — exact
    // parity on integer-weight graphs, where all sums are exact in doubles.
    val spark = g.edges.sparkSession
    graft.graph.LocalGraph.collectIfAtMost(und,
        graft.graph.LocalGraph.maxEdges(spark)) match {
      case Some(eRows) =>
        val eArr = eRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        und.unpersist(blocking = false)
        return graft.graph.LocalGraph.louvain(spark, eArr, maxIters)
      case None => ()
    }
    val degrees = und.groupBy(col("src").as("id")).agg(sum(col("w")).as("k")).persist()
    val m2 = und.agg(sum(col("w"))).collect()(0).getDouble(0) // = 2m
    // state carries (id, comm, k): the per-iteration tot and gain joins then
    // never have to re-join the degrees table
    var comm = degrees.select(col("id"), col("id").as("comm"), col("k"))
      .localCheckpoint()
    var i = 0
    var stable = false
    while (i < maxIters && !stable) {
      val tot = comm.groupBy(col("comm")).agg(sum(col("k")).as("tot"))
      // weight from each node to each neighboring community (+ its own)
      val wToComm = und
        .join(comm.select(col("id").as("dst"), col("comm").as("nc")), "dst")
        .groupBy(col("src").as("id"), col("nc"))
        .agg(sum(col("w")).as("w_ic"))
      val scored = wToComm
        .join(comm.select(col("id"), col("k")), "id")
        .join(tot.withColumnRenamed("comm", "nc"), "nc")
        .select(col("id"), col("nc"),
          (col("w_ic") - col("k") * col("tot") / lit(m2)).as("gain"))
      // argmax gain, ties -> lowest community id; keep old community if no
      // strictly positive improvement candidate exists
      val best = scored
        .groupBy("id")
        .agg(min_by(col("nc"), struct((-col("gain")).as("g"), col("nc"))).as("bestc"))
      // the changed flag rides inside the checkpointed frame: stability is a
      // cheap scan of materialized blocks, not a fresh join job
      val newc = coalesce(col("bestc"), col("comm"))
      val next = comm.join(best, Seq("id"), "left_outer")
        .select(col("id"), newc.as("comm"), col("k"),
          (newc =!= col("comm")).as("__chg"))
        .localCheckpoint()
      stable = next.filter(col("__chg")).limit(1).count() == 0
      comm = next.drop("__chg")
      i += 1
    }
    // comm is checkpoint-materialized; release the loop-invariant caches
    Seq(und, degrees).foreach(_.unpersist(blocking = false))
    comm.select(col("id"), col("comm"))
  }
}

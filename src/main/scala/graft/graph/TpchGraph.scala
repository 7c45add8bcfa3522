package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic property graph derived from the driver's TPC-H-ish tables —
  * the fixture graph for the operator catalog (every query over it has a
  * plain-SQL oracle over the base tables).
  *
  * Node ids are globally unique via a 10^12 tag stride, so the scheme holds
  * at any scale factor (keys stay far below 10^12 even at 100 TB).
  */
object TpchGraph {
  val Stride = 1000000000000L
  val RegionTag = 1L
  val NationTag = 2L
  val SupplierTag = 3L
  val CustomerTag = 4L
  val PartTag = 5L
  val OrderTag = 6L

  def gid(tag: Long, key: Column): Column = lit(tag * Stride) + key.cast("long")
  def key(id: Column): Column = id % Stride

  // Fixture graphs are rebuilt by many catalog queries in one session; cache
  // the (persisted) DataFrames per directory. At cluster scale this is the
  // "dimension tables stay cached" pattern — nodes/edges here are derived
  // views, small relative to the facts they index.
  //
  // Hash-partition on the join keys BEFORE caching (same layout as the
  // bucketed store, GraphIO.saveBucketed): a cached plan's partitioning is
  // pinned (no AQE re-coalesce), so caching the raw union would pin the
  // skewed scan splits — a handful of fat partitions that serialize every
  // downstream scan — and every Expand (edges.src == nodes.id) would add
  // an exchange. Partitioned this way, cache scans parallelize evenly and
  // equi-joins on id/src reuse the cached HashPartitioning outright.
  private val cache = scala.collection.concurrent.TrieMap.empty[String, PropertyGraph]

  private def partitioned(g: PropertyGraph): PropertyGraph = {
    val p = g.nodes.sparkSession.sparkContext.defaultParallelism
    // NOT clustered by rel inside partitions: a sortWithinPartitions("rel")
    // before the persist (to let InMemoryTableScan batch-prune the `rel = X`
    // filter every hop opens with) was measured r18 with a same-JVM A/B
    // (tools/ProfileRelCluster) — steady-state scan and 1-hop times were
    // 0.87-1.18x, i.e. noise: at this cache size the scans are job-floor-
    // bound, not decompression-bound, so the extra build-time sort buys
    // nothing the bench can see.
    PropertyGraph(
      g.nodes.repartition(p, col("id")).persist(),
      g.edges.repartition(p, col("src")).persist())
  }

  def apply(spark: SparkSession, dir: String): PropertyGraph =
    cache.getOrElseUpdate(s"lpg:$dir", partitioned(build(spark, dir)))

  /** Heterogeneous LPG: Region/Nation/Supplier/Customer/Part/Order nodes with
    * IN_REGION / FROM_NATION / PLACED_BY / CONTAINS / SUPPLIES edges.
    */
  def build(spark: SparkSession, dir: String): PropertyGraph = {
    def n(df: DataFrame, tag: Long, keyCol: String, label: String,
        name: Column, acctbal: Column, extra: Column): DataFrame =
      df.select(
        gid(tag, col(keyCol)).as("id"),
        array(lit(label)).as("labels"),
        name.as("name"),
        acctbal.cast("double").as("acctbal"),
        extra.cast("string").as("category"))

    val nodes =
      n(Tables.region(spark, dir), RegionTag, "r_regionkey", "Region", col("r_name"), lit(null), lit(null))
        .unionByName(n(Tables.nation(spark, dir), NationTag, "n_nationkey", "Nation", col("n_name"), lit(null), lit(null)))
        .unionByName(n(Tables.supplier(spark, dir), SupplierTag, "s_suppkey", "Supplier", col("s_name"), col("s_acctbal"), lit(null)))
        .unionByName(n(Tables.customer(spark, dir), CustomerTag, "c_custkey", "Customer", col("c_name"), col("c_acctbal"), col("c_mktsegment")))
        .unionByName(n(Tables.part(spark, dir), PartTag, "p_partkey", "Part", col("p_name"), lit(null), col("p_brand")))
        .unionByName(n(Tables.orders(spark, dir), OrderTag, "o_orderkey", "Order", col("o_orderkey").cast("string"), col("o_totalprice"), col("o_orderstatus")))

    def e(df: DataFrame, srcTag: Long, srcKey: String, dstTag: Long, dstKey: String,
        rel: String, weight: Column): DataFrame =
      df.select(
        gid(srcTag, col(srcKey)).as("src"),
        gid(dstTag, col(dstKey)).as("dst"),
        lit(rel).as("rel"),
        weight.cast("double").as("weight"))

    val li = Tables.lineitem(spark, dir)
    val edges =
      e(Tables.nation(spark, dir), NationTag, "n_nationkey", RegionTag, "n_regionkey", "IN_REGION", lit(1.0))
        .unionByName(e(Tables.customer(spark, dir), CustomerTag, "c_custkey", NationTag, "c_nationkey", "FROM_NATION", lit(1.0)))
        .unionByName(e(Tables.supplier(spark, dir), SupplierTag, "s_suppkey", NationTag, "s_nationkey", "FROM_NATION", lit(1.0)))
        .unionByName(e(Tables.orders(spark, dir), OrderTag, "o_orderkey", CustomerTag, "o_custkey", "PLACED_BY", lit(1.0)))
        .unionByName(e(li, OrderTag, "l_orderkey", PartTag, "l_partkey", "CONTAINS", col("l_quantity")))
        .unionByName(e(li.select("l_suppkey", "l_partkey").distinct(),
          SupplierTag, "l_suppkey", PartTag, "l_partkey", "SUPPLIES", lit(1.0)))

    PropertyGraph(nodes, edges)
  }

  /** Homogeneous DAG over part keys for path operators: edges k → 2k and
    * k → 2k+1 (binary tree, k >= 1) plus k → k+1 (chain), so multiple routes
    * exist between most pairs — exercises min-distance semantics. dst > src
    * always, hence acyclic; derivable in plain SQL for the oracle.
    */
  def partDag(spark: SparkSession, dir: String): PropertyGraph =
    cache.getOrElseUpdate(s"dag:$dir", {
      val g = buildPartDag(spark, dir)
      PropertyGraph(g.nodes.persist(), g.edges.persist())
    })

  /** The part DAG restricted to keys <= cap — the fixture for unbounded
    * path enumeration ([*]), whose result multiplicity is the number of
    * simple paths and therefore must run on a bounded subgraph (the same
    * reason the oracle's recursive CTE needs the cap).
    */
  def partDagCapped(spark: SparkSession, dir: String, cap: Int): PropertyGraph =
    cache.getOrElseUpdate(s"dagcap$cap:$dir", {
      val g = buildPartDag(spark, dir)
      PropertyGraph(
        g.nodes.filter(col("id") <= cap).persist(),
        g.edges.filter(col("src") <= cap && col("dst") <= cap).persist())
    })

  /** Cyclic fixture over part keys 1..cap: chain k → k+1, the closing edge
    * cap → 1, and a chord 1 → 3 — the smallest graph where openCypher
    * edge-unique walks and node-unique simple paths genuinely differ (a walk
    * may return to node 1 over the closing edge and leave again over the
    * unused chord). Derivable in plain SQL for the oracle.
    */
  def partCycle(spark: SparkSession, dir: String, cap: Int): PropertyGraph = {
    require(cap >= 3, s"partCycle needs cap >= 3 (chord 1->3), got $cap")
    cache.getOrElseUpdate(s"cycle$cap:$dir", {
      val p = Tables.part(spark, dir).select(col("p_partkey").as("k"))
        .filter(col("k") >= 1 && col("k") <= cap)
      val chain = p.filter(col("k") < cap)
        .select(col("k").as("src"), (col("k") + 1).as("dst"))
      val closing = p.filter(col("k") === cap)
        .select(col("k").as("src"), lit(1L).as("dst"))
      val chord = p.filter(col("k") === 1)
        .select(col("k").as("src"), lit(3L).as("dst"))
      val edges = chain.unionByName(closing).unionByName(chord)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
          lit("LINK").as("rel"), lit(1.0).as("weight"))
      val nodes = p.select(col("k").cast("long").as("id"), array(lit("Part")).as("labels"),
        col("k").cast("string").as("name"), lit(null).cast("double").as("acctbal"),
        lit(null).cast("string").as("category"))
      PropertyGraph(nodes.persist(), edges.persist())
    })
  }

  def buildPartDag(spark: SparkSession, dir: String): PropertyGraph = {
    val p = Tables.part(spark, dir).select(col("p_partkey").as("k"))
    val dst = p.select(col("k").as("k2"))
    def join(cond: Column): DataFrame =
      p.join(dst, cond).select(col("k").as("src"), col("k2").as("dst"),
        lit("LINK").as("rel"), lit(1.0).as("weight"))
    val edges =
      join(col("k2") === col("k") * 2 && col("k") >= 1)
        .unionByName(join(col("k2") === col("k") * 2 + 1 && col("k") >= 1))
        .unionByName(join(col("k2") === col("k") + 1))
    val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"),
      col("k").cast("string").as("name"), lit(null).cast("double").as("acctbal"),
      lit(null).cast("string").as("category"))
    PropertyGraph(nodes, edges)
  }
}

package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property value index — the Spark re-expression of the reference's
  * node-property hash index (database.rs:998 `create_property_index`,
  * :1245 `drop_property_index`, :1251 `has_property_index`, :1270
  * `find_nodes_by_property`; index/hash.rs).
  *
  * An in-memory value→ids hash map doesn't survive the move to a
  * 100 TB corpus, so the index here is a `(v, id)` projection of the
  * property written to parquet RANGE-PARTITIONED AND SORTED by value:
  * an equality (or range) lookup pushes its predicate into the scan,
  * parquet row-group min/max statistics prune everything but the
  * matching stripes, and the read touches O(matches) data instead of
  * the corpus — the distributed analogue of the hash probe. Lookups on
  * unindexed properties fall back to a full node scan with the same
  * output shape (the reference does the same, database.rs:1275-1285).
  */
object PropertyIndexes {

  /** Registered index: parquet path of the sorted (v, id) projection. */
  final case class PropertyIndex(prop: String, path: String, spark: SparkSession) {
    /** Node ids whose `prop` equals `value` — pushed-predicate read of the
      * sorted projection (`id: Long` rows).
      */
    def find(value: Any): DataFrame =
      spark.read.parquet(path)
        .filter(col("v") === lit(value))
        .select(col("id"))
  }

  // Keyed by (graph instance token, property) — same per-instance scoping
  // as the fixture/vector registries: a rebuilt or mutated graph is a new
  // instance and never sees a stale index. The token is a per-instance
  // UUID (PropertyGraph.instanceToken), not identityHashCode, which can
  // collide with a garbage-collected instance and serve a stale index.
  private val registry =
    scala.collection.concurrent.TrieMap.empty[(String, String), PropertyIndex]

  private def key(g: PropertyGraph, prop: String): (String, String) =
    (g.instanceToken, prop)

  /** Build and register the index for `prop` over `g`'s nodes. The
    * projection drops null values (a null never equality-matches) and is
    * written sorted by value: `repartitionByRange` bounds any one
    * partition to one value range (64 output files here; proportional to
    * the corpus at scale) and `sortWithinPartitions` makes every parquet
    * row-group's min/max tight.
    */
  def create(g: PropertyGraph, prop: String, dir: String): PropertyIndex = {
    require(g.nodes.columns.contains(prop), s"no node property column '$prop'")
    val proj = g.nodes
      .filter(col(prop).isNotNull)
      .select(col(prop).as("v"), col("id"))
    proj.repartitionByRange(64, col("v"))
      .sortWithinPartitions("v")
      .write.mode("overwrite").parquet(dir)
    val idx = PropertyIndex(prop, dir, g.nodes.sparkSession)
    registry.put(key(g, prop), idx)
    idx
  }

  def get(g: PropertyGraph, prop: String): Option[PropertyIndex] =
    registry.get(key(g, prop))

  def has(g: PropertyGraph, prop: String): Boolean =
    registry.contains(key(g, prop))

  def drop(g: PropertyGraph, prop: String): Boolean =
    registry.remove(key(g, prop)).isDefined

  /** Index-accelerated lookup when `prop` is indexed, full node scan
    * otherwise — both return `id: Long` rows.
    */
  def findNodesByProperty(g: PropertyGraph, prop: String, value: Any): DataFrame =
    get(g, prop) match {
      case Some(idx) => idx.find(value)
      case None =>
        g.nodes.filter(col(prop) === lit(value)).select(col("id"))
    }
}

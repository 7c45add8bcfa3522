package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LPG mutations (reference plan.rs:393-475 CreateNode/CreateEdge/DeleteNode/
  * DeleteEdge/SetProperty/AddLabel/RemoveLabel and plan.rs:558-576 Merge;
  * physical operators mutation.rs, merge.rs).
  *
  * Spark-native shape: mutations are *functional* — each returns a new
  * PropertyGraph whose nodes/edges DataFrames are declarative transformations
  * of the old ones. Persistence is a plain parquet/Delta write of the
  * resulting tables (the reference's WAL+snapshot collapses into the table
  * commit); MVCC snapshots collapse into "the old DataFrame is still valid".
  * Nothing here materializes on the driver, so a mutation over 10^11 rows is
  * still one distributed job.
  */
object Mutations {

  /** CreateNode (plan.rs:393-403): append rows; missing property columns are
    * null-filled. Properties outside the typed schema route into the `props`
    * map fallback column (SURVEY §1.3 hybrid — typed projection for the
    * declared catalog, schemaless Value map for the rest, reference
    * graph/lpg/store.rs:176-182), added to the graph on first use. Values
    * are stored as strings, matching the store's plain-string Value view.
    */
  /** Uniqueness-constraint probe (reference catalog/mod.rs:210-223
    * add_unique_constraint; violation = ConstraintViolation error): does any
    * EXISTING node with `label` already carry one of `values` in `prop`?
    * One filtered scan with the label/value predicates pushed down —
    * dimension-sized output, the distributed form of the reference's
    * per-insert unique-index probe. A property column absent from the
    * schema means no node has it: vacuously no violation.
    */
  def violatesUnique(g: PropertyGraph, label: String, prop: String,
      values: Seq[Any]): Boolean =
    g.nodes.columns.contains(prop) && values.nonEmpty &&
      g.nodes.filter(array_contains(col("labels"), label) &&
        col(prop).isin(values: _*)).limit(1).count() > 0

  /** Label-BLIND key-existence probe — mirrors [[mergeNodes]]'s match
    * semantics exactly (its key anti-join runs over all nodes, not a
    * label), so callers predicting whether a MERGE takes its create path
    * must use this and not the label-filtered [[violatesUnique]].
    */
  def existsByKey(g: PropertyGraph, prop: String, value: Any): Boolean =
    g.nodes.columns.contains(prop) &&
      g.nodes.filter(col(prop) === lit(value)).limit(1).count() > 0

  def createNodes(g: PropertyGraph, newNodes: DataFrame): PropertyGraph = {
    val extra = (newNodes.columns.toSet -- g.nodes.columns.toSet).toSeq.sorted
    val (base, incoming) =
      if (extra.isEmpty) (g.nodes, newNodes)
      else {
        val withMap = if (g.nodes.columns.contains("props")) g.nodes
          else g.nodes.withColumn("props", lit(null).cast("map<string,string>"))
        // null-valued keys are absent, same as a typed column's null
        val routed = newNodes.withColumn("props",
          map_filter(
            map(extra.flatMap(k => Seq(lit(k), col(k).cast("string"))): _*),
            (_, v) => v.isNotNull))
          .drop(extra: _*)
        (withMap, routed)
      }
    val aligned = base.columns.foldLeft(incoming) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(base.schema(c).dataType))
    }.select(base.columns.map(col): _*)
    g.copy(nodes = base.unionByName(aligned))
  }

  /** CreateEdge (plan.rs:406-420). Unknown edge properties route into a
    * `props` map column like [[createNodes]] (previously they were silently
    * dropped).
    */
  def createEdges(g: PropertyGraph, newEdges: DataFrame): PropertyGraph = {
    val extra = (newEdges.columns.toSet -- g.edges.columns.toSet).toSeq.sorted
    val (base, incoming) =
      if (extra.isEmpty) (g.edges, newEdges)
      else {
        val withMap = if (g.edges.columns.contains("props")) g.edges
          else g.edges.withColumn("props", lit(null).cast("map<string,string>"))
        val routed = newEdges.withColumn("props",
          map_filter(
            map(extra.flatMap(k => Seq(lit(k), col(k).cast("string"))): _*),
            (_, v) => v.isNotNull))
          .drop(extra: _*)
        (withMap, routed)
      }
    val aligned = base.columns.foldLeft(incoming) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(base.schema(c).dataType))
    }.select(base.columns.map(col): _*)
    g.copy(edges = base.unionByName(aligned))
  }

  /** SetProperty (plan.rs:445-455): set `prop` to `value` on nodes matching
    * `cond` (all others untouched). A property outside the typed schema
    * writes into the `props` map fallback (added on first use), so
    * `SET n.newProp = v` works without a schema migration — the reference's
    * schemaless property semantics.
    */
  def setNodeProperty(g: PropertyGraph, cond: Column, prop: String,
      value: Column): PropertyGraph =
    if (g.nodes.columns.contains(prop))
      g.copy(nodes = g.nodes.withColumn(prop,
        when(cond, value).otherwise(col(prop))))
    else {
      val withMap = if (g.nodes.columns.contains("props")) g.nodes
        else g.nodes.withColumn("props", lit(null).cast("map<string,string>"))
      // drop any existing entry first: map_concat refuses duplicate keys
      // under the default dedup policy
      g.copy(nodes = withMap.withColumn("props",
        when(cond, map_concat(
          map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
          map(lit(prop), value.cast("string"))))
          .otherwise(col("props"))))
    }

  /** RemoveProperty (reference database.rs:966 remove_node_property /
    * :974 remove_edge_property; Cypher `REMOVE n.prop`): a typed column
    * nulls out for matched rows (NULL is the absent-property encoding —
    * `properties()` and IS NULL tests agree); a dynamic key drops from
    * the `props` map.
    */
  def removeNodeProperty(g: PropertyGraph, cond: Column, prop: String): PropertyGraph =
    if (g.nodes.columns.contains(prop))
      g.copy(nodes = g.nodes.withColumn(prop,
        when(cond, lit(null).cast(g.nodes.schema(prop).dataType))
          .otherwise(col(prop))))
    else if (g.nodes.columns.contains("props"))
      g.copy(nodes = g.nodes.withColumn("props",
        when(cond, map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop))
          .otherwise(col("props"))))
    else g // nothing to remove

  def removeEdgeProperty(g: PropertyGraph, cond: Column, prop: String): PropertyGraph =
    if (g.edges.columns.contains(prop))
      g.copy(edges = g.edges.withColumn(prop,
        when(cond, lit(null).cast(g.edges.schema(prop).dataType))
          .otherwise(col(prop))))
    else if (g.edges.columns.contains("props"))
      g.copy(edges = g.edges.withColumn("props",
        when(cond, map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop))
          .otherwise(col("props"))))
    else g

  /** AddLabel / RemoveLabel (plan.rs:458-475): labels is an array column;
    * add = distinct append, remove = filter out.
    */
  def addLabel(g: PropertyGraph, cond: Column, label: String): PropertyGraph =
    g.copy(nodes = g.nodes.withColumn("labels",
      when(cond && !array_contains(col("labels"), label),
        array_append(col("labels"), label)).otherwise(col("labels"))))

  def removeLabel(g: PropertyGraph, cond: Column, label: String): PropertyGraph =
    g.copy(nodes = g.nodes.withColumn("labels",
      when(cond, array_remove(col("labels"), label)).otherwise(col("labels"))))

  /** DeleteNode (plan.rs:423-434): `detach = true` drops incident edges
    * (DETACH DELETE); otherwise nodes with incident edges are kept, matching
    * the reference's constraint error semantics as a soft skip.
    */
  def deleteNodes(g: PropertyGraph, cond: Column, detach: Boolean): PropertyGraph = {
    val doomed = g.nodes.filter(cond).select(col("id"))
    if (detach) {
      val edges2 = g.edges
        .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select(g.edges.columns.map(col): _*)
      PropertyGraph(g.nodes.filter(!coalesce(cond, lit(false))), edges2)
    } else {
      val attached = g.edges.select(col("src").as("id"))
        .unionByName(g.edges.select(col("dst").as("id"))).distinct()
      val deletable = doomed.join(attached, Seq("id"), "left_anti")
      g.copy(nodes = g.nodes.join(deletable, Seq("id"), "left_anti"))
    }
  }

  /** DeleteEdge (plan.rs:437-442). */
  def deleteEdges(g: PropertyGraph, cond: Column): PropertyGraph =
    g.copy(edges = g.edges.filter(!coalesce(cond, lit(false))))

  // ---- binding-driven variants (id sets come from a matched pattern; a
  // join-based update is the scalable form of "WHERE id IN (…)") ----

  private def flagByIds(g: PropertyGraph, ids: DataFrame): DataFrame =
    g.nodes.join(
      ids.select(col(ids.columns.head).as("id")).distinct()
        .withColumn("__hit", lit(true)),
      Seq("id"), "left_outer")

  def setNodePropertyByIds(g: PropertyGraph, ids: DataFrame, prop: String,
      value: Column): PropertyGraph =
    if (g.nodes.columns.contains(prop))
      g.copy(nodes = flagByIds(g, ids)
        .withColumn(prop, when(col("__hit"), value).otherwise(col(prop)))
        .drop("__hit"))
    else {
      // dynamic key → the `props` map fallback (see setNodeProperty)
      val withMap = if (g.nodes.columns.contains("props")) g.nodes
        else g.nodes.withColumn("props", lit(null).cast("map<string,string>"))
      g.copy(nodes = flagByIds(g.copy(nodes = withMap), ids)
        .withColumn("props",
          when(col("__hit"), map_concat(
            map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
            map(lit(prop), value.cast("string"))))
            .otherwise(col("props")))
        .drop("__hit"))
    }

  /** Apply a whole SET clause's node items (typed/dynamic properties +
    * labels) against one id set in a SINGLE flag join. The per-item
    * functions above each re-join the full node table — k items = k
    * exchanges; a Cypher `SET n.a = …, n += {…}, n:L` collapses to one
    * exchange here. Items apply in order via chained withColumn on the one
    * flagged plan, so a later item's value expression sees an earlier
    * item's write — identical semantics to folding the per-item functions.
    */
  def setNodeFieldsByIds(g: PropertyGraph, ids: DataFrame,
      props: Seq[(String, Column)], labels: Seq[String] = Nil): PropertyGraph = {
    val needsMap = props.exists { case (k, _) => !g.nodes.columns.contains(k) } &&
      !g.nodes.columns.contains("props")
    val base = if (needsMap)
      g.nodes.withColumn("props", lit(null).cast("map<string,string>"))
    else g.nodes
    val flagged = flagByIds(g.copy(nodes = base), ids)
    val withProps = props.foldLeft(flagged) { case (df, (prop, value)) =>
      if (base.columns.contains(prop))
        df.withColumn(prop, when(col("__hit"), value).otherwise(col(prop)))
      else
        df.withColumn("props",
          when(col("__hit"), map_concat(
            map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
            map(lit(prop), value.cast("string"))))
            .otherwise(col("props")))
    }
    val withLabels = labels.foldLeft(withProps) { (df, l) =>
      df.withColumn("labels",
        when(col("__hit") && !array_contains(col("labels"), l),
          array_append(col("labels"), l)).otherwise(col("labels")))
    }
    g.copy(nodes = withLabels.drop("__hit"))
  }

  def addLabelByIds(g: PropertyGraph, ids: DataFrame, label: String): PropertyGraph =
    g.copy(nodes = flagByIds(g, ids)
      .withColumn("labels",
        when(col("__hit") && !array_contains(col("labels"), label),
          array_append(col("labels"), label)).otherwise(col("labels")))
      .drop("__hit"))

  def removeNodePropertyByIds(g: PropertyGraph, ids: DataFrame, prop: String): PropertyGraph =
    if (g.nodes.columns.contains(prop))
      g.copy(nodes = flagByIds(g, ids)
        .withColumn(prop,
          when(col("__hit"), lit(null).cast(g.nodes.schema(prop).dataType))
            .otherwise(col(prop)))
        .drop("__hit"))
    else if (g.nodes.columns.contains("props"))
      g.copy(nodes = flagByIds(g, ids)
        .withColumn("props",
          when(col("__hit"), map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop))
            .otherwise(col("props")))
        .drop("__hit"))
    else g

  def removeLabelByIds(g: PropertyGraph, ids: DataFrame, label: String): PropertyGraph =
    g.copy(nodes = flagByIds(g, ids)
      .withColumn("labels",
        when(col("__hit"), array_remove(col("labels"), label)).otherwise(col("labels")))
      .drop("__hit"))

  def deleteNodesByIds(g: PropertyGraph, ids: DataFrame, detach: Boolean): PropertyGraph = {
    val doomed = ids.select(col(ids.columns.head).as("id")).distinct()
    if (detach) {
      val edges2 = g.edges
        .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select(g.edges.columns.map(col): _*)
      PropertyGraph(g.nodes.join(doomed, Seq("id"), "left_anti"), edges2)
    } else {
      val attached = g.edges.select(col("src").as("id"))
        .unionByName(g.edges.select(col("dst").as("id"))).distinct()
      val deletable = doomed.join(attached, Seq("id"), "left_anti")
      g.copy(nodes = g.nodes.join(deletable, Seq("id"), "left_anti"))
    }
  }

  // ---- edge variants keyed by edge id (reference database.rs:945
  // set_edge_property / :931 delete_edge / :974 remove_edge_property):
  // eids come from a matched pattern's relationship binding; the join-based
  // update is the scalable "WHERE eid IN (…)". Callers pass a graph whose
  // edges carry `eid` (PropertyGraph.withEdgeIds). ----

  private def flagEdgesByIds(g: PropertyGraph, eids: DataFrame): DataFrame = {
    require(g.edges.columns.contains("eid"),
      "edge mutations need withEdgeIds (no eid column on edges)")
    g.edges.join(
      eids.select(col(eids.columns.head).as("eid")).distinct()
        .withColumn("__hit", lit(true)),
      Seq("eid"), "left_outer")
  }

  def setEdgePropertyByIds(g: PropertyGraph, eids: DataFrame, prop: String,
      value: Column): PropertyGraph =
    if (g.edges.columns.contains(prop))
      g.copy(edges = flagEdgesByIds(g, eids)
        .withColumn(prop, when(col("__hit"), value).otherwise(col(prop)))
        .drop("__hit"))
    else {
      // dynamic key → the `props` map fallback (see setNodePropertyByIds)
      val withMap = if (g.edges.columns.contains("props")) g.edges
        else g.edges.withColumn("props", lit(null).cast("map<string,string>"))
      g.copy(edges = flagEdgesByIds(g.copy(edges = withMap), eids)
        .withColumn("props",
          when(col("__hit"), map_concat(
            map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
            map(lit(prop), value.cast("string"))))
            .otherwise(col("props")))
        .drop("__hit"))
    }

  def removeEdgePropertyByIds(g: PropertyGraph, eids: DataFrame, prop: String): PropertyGraph =
    if (g.edges.columns.contains(prop))
      g.copy(edges = flagEdgesByIds(g, eids)
        .withColumn(prop,
          when(col("__hit"), lit(null).cast(g.edges.schema(prop).dataType))
            .otherwise(col(prop)))
        .drop("__hit"))
    else if (g.edges.columns.contains("props"))
      g.copy(edges = flagEdgesByIds(g, eids)
        .withColumn("props",
          when(col("__hit"), map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop))
            .otherwise(col("props")))
        .drop("__hit"))
    else g

  def deleteEdgesByIds(g: PropertyGraph, eids: DataFrame): PropertyGraph = {
    require(g.edges.columns.contains("eid"),
      "edge mutations need withEdgeIds (no eid column on edges)")
    g.copy(edges = g.edges.join(
      eids.select(col(eids.columns.head).as("eid")).distinct(),
      Seq("eid"), "left_anti"))
  }

  // ---- predicate-pushdown edge mutations (no eid materialization): when a
  // single-hop MATCH's WHERE decomposes into per-endpoint and per-edge
  // predicates, the mutation compiles to ONE pass over the edge table with
  // (broadcastable) endpoint-id membership flags, instead of first running
  // the match to materialize an eid set and then re-joining the edge table
  // on it. At 100 TB that skips a billion-row id-set exchange AND a second
  // full edge-table pass per mutation; the endpoint id sets are dimension-
  // sized (filtered node ids), the natural broadcast side. ----

  private def endpointFlagged(edges: DataFrame, relType: Option[String],
      srcIds: Option[DataFrame], dstIds: Option[DataFrame],
      edgePred: Option[Column]): (DataFrame, Column, Seq[String]) = {
    var df = edges
    // null-guard like every other term: a null rel would make hit null, and
    // deleteEdgesWhere's filter(!hit) would DROP an edge the MATCH never binds
    var hit: Column = relType.map(t => coalesce(col("rel") === lit(t), lit(false)))
      .getOrElse(lit(true))
    edgePred.foreach(p => hit = hit && coalesce(p, lit(false)))
    var flags = List.empty[String]
    srcIds.foreach { s =>
      df = df.join(s.select(col(s.columns.head).as("src")).distinct()
        .withColumn("__hit_src", lit(true)), Seq("src"), "left_outer")
      hit = hit && coalesce(col("__hit_src"), lit(false))
      flags ::= "__hit_src"
    }
    dstIds.foreach { d =>
      df = df.join(d.select(col(d.columns.head).as("dst")).distinct()
        .withColumn("__hit_dst", lit(true)), Seq("dst"), "left_outer")
      hit = hit && coalesce(col("__hit_dst"), lit(false))
      flags ::= "__hit_dst"
    }
    (df, hit, flags)
  }

  /** SET on every edge matching (relType, srcIds-membership,
    * dstIds-membership, edgePred) — the pushdown form of an eid-keyed SET
    * when edge identity is not needed (each physical edge matches at most
    * once; its endpoints are functionally determined).
    */
  def setEdgePropsWhere(g: PropertyGraph, relType: Option[String],
      srcIds: Option[DataFrame], dstIds: Option[DataFrame],
      edgePred: Option[Column], props: Seq[(String, Column)]): PropertyGraph = {
    val needsMap = props.exists { case (k, _) => !g.edges.columns.contains(k) } &&
      !g.edges.columns.contains("props")
    val base = if (needsMap)
      g.edges.withColumn("props", lit(null).cast("map<string,string>"))
    else g.edges
    val (flagged, hit, flags) = endpointFlagged(base, relType, srcIds, dstIds, edgePred)
    val out = props.foldLeft(flagged) { case (df, (prop, value)) =>
      if (base.columns.contains(prop))
        df.withColumn(prop, when(hit, value).otherwise(col(prop)))
      else
        df.withColumn("props",
          when(hit, map_concat(
            map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
            map(lit(prop), value.cast("string"))))
            .otherwise(col("props")))
    }
    g.copy(edges = out.drop(flags: _*))
  }

  /** The (src, dst, rel) keys of every edge the pushdown predicate matches
    * — the OCC write-set face of [[setEdgePropsWhere]] /
    * [[deleteEdgesWhere]] (same flags, so the tracked write set is exactly
    * the mutation's hit set).
    */
  def matchedEdgeKeys(g: PropertyGraph, relType: Option[String],
      srcIds: Option[DataFrame], dstIds: Option[DataFrame],
      edgePred: Option[Column]): DataFrame = {
    val (flagged, hit, _) = endpointFlagged(g.edges, relType, srcIds, dstIds, edgePred)
    flagged.filter(hit).select("src", "dst", "rel")
  }

  /** DELETE of every matching edge — pushdown form of deleteEdgesByIds. */
  def deleteEdgesWhere(g: PropertyGraph, relType: Option[String],
      srcIds: Option[DataFrame], dstIds: Option[DataFrame],
      edgePred: Option[Column]): PropertyGraph = {
    val (flagged, hit, flags) = endpointFlagged(g.edges, relType, srcIds, dstIds, edgePred)
    g.copy(edges = flagged.filter(!hit).drop(flags: _*))
  }

  /** Merge (plan.rs:558-576; merge.rs): match-or-create by a key column, with
    * ON MATCH / ON CREATE property updates — the MERGE INTO shape. `incoming`
    * must carry the node schema's columns (or a subset + nulls).
    *
    * Returns the graph where for each incoming row: if a node with the same
    * `keyCol` exists, `onMatchSet` columns are applied; otherwise the row is
    * inserted with `onCreateSet` applied.
    */
  def mergeNodes(g: PropertyGraph, incoming: DataFrame, keyCol: String,
      onMatchSet: Map[String, Column] = Map.empty,
      onCreateSet: Map[String, Column] = Map.empty): PropertyGraph = {
    // apply ON MATCH via a flag join against the incoming key set directly
    // (a node is matched iff its key appears in `incoming`; intersecting
    // with the node keys first would be a redundant extra exchange)
    val inKeys = incoming.select(col(keyCol)).distinct()
    val flagged = g.nodes.join(
      inKeys.withColumn("__matched", lit(true)), Seq(keyCol), "left_outer")
    val updated = onMatchSet.foldLeft(flagged) { case (df, (p, v)) =>
      df.withColumn(p, when(col("__matched"), v).otherwise(col(p)))
    }.drop("__matched")
    val toCreate0 = incoming.join(g.nodes.select(col(keyCol)).distinct(),
      Seq(keyCol), "left_anti")
    val toCreate = onCreateSet.foldLeft(toCreate0) { case (df, (p, v)) =>
      df.withColumn(p, v)
    }
    createNodes(g.copy(nodes = updated.select(g.nodes.columns.map(col): _*)), toCreate)
  }
}

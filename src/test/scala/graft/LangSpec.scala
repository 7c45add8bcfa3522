package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.graphql.GraphQLFrontend
import graft.frontends.gremlin.GremlinFrontend
import graft.graph.TpchGraph

class LangSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("gremlin: shuffle is a seeded deterministic permutation") {
    val a = session.gremlin("g.V().hasLabel('Region').values('name').shuffle()")
      .collect().map(_.getString(0)).toSeq
    val b = session.gremlin("g.V().hasLabel('Region').values('name').shuffle()")
      .collect().map(_.getString(0)).toSeq
    assert(a == b, "same seed must give the same order")
    assert(a.sorted != a, "hash order must differ from the natural order")
    val reseeded = session.gremlin(
      "g.V().hasLabel('Region').values('name').shuffle(7)")
      .collect().map(_.getString(0)).toSeq
    assert(reseeded.sorted == a.sorted, "reseeding permutes, never drops")
    assert(reseeded != a, "a different seed gives a different permutation")
  }

  test("gremlin: properties() yields key/value step objects") {
    val vals = session.gremlin(
      "g.V().hasLabel('Region').properties('name').value().order().by()")
      .collect().map(_.getString(0)).toSeq
    val exp = spark.read.parquet(s"$sf/region.parquet")
      .select("r_name").collect().map(_.getString(0)).toSeq.sorted
    assert(vals == exp)
    val keys = session.gremlin(
      "g.V().hasLabel('Region').properties('name').key().dedup()")
      .collect().map(_.getString(0)).toSeq
    assert(keys == Seq("name"))
    // absent properties yield no object: regions have no acctbal
    val n = session.gremlin(
      "g.V().hasLabel('Region').properties('acctbal').count()")
      .collect().head.getLong(0)
    assert(n == 0L)
    // bare properties() walks every present property of the element
    val all = session.gremlin(
      "g.V().hasLabel('Region').properties().key().dedup().order().by()")
      .collect().map(_.getString(0)).toSeq
    assert(all.contains("name") && !all.contains("acctbal"))
  }

  test("gremlin: count and sum aggregates") {
    val n = session.gremlin("g.V().hasLabel('Customer').count()")
      .collect().head.getLong(0)
    assert(n == spark.read.parquet(s"$sf/customer.parquet").count())
    val total = session.gremlin("g.V().hasLabel('Customer').sum('acctbal')")
      .collect().head.getDouble(0)
    assert(total != 0.0)
  }

  test("gremlin: where(out(...)) filters by sub-traversal existence") {
    // customers with at least one order = distinct o_custkey count
    val withOrders = session.gremlin(
      "g.V().hasLabel('Customer').where(in('PLACED_BY')).count()")
      .collect().head.getLong(0)
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(withOrders == expected)
    // the complement via where(not(...)) partitions the label set
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    val without = session.gremlin(
      "g.V().hasLabel('Customer').where(not(in('PLACED_BY'))).count()")
      .collect().head.getLong(0)
    assert(withOrders + without == total)
  }

  test("gremlin: choose() with a traversal condition branches per traverser") {
    // regions have no out-edges, nations do → choose(out(...)) splits them
    val rows = session.gremlin(
      "g.V().hasLabel('Region').choose(out('IN_REGION'), constant('linked'), constant('leaf'))")
      .collect().map(_.getString(0))
    assert(rows.nonEmpty && rows.forall(_ == "leaf"))
    val nat = session.gremlin(
      "g.V().hasLabel('Nation').choose(out('IN_REGION'), constant('linked'), constant('leaf'))")
      .collect().map(_.getString(0))
    assert(nat.nonEmpty && nat.forall(_ == "linked"))
  }

  test("gremlin: out() with several edge labels unions them") {
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    val lines = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val n = session.gremlin(
      "g.V().hasLabel('Order').out('PLACED_BY','CONTAINS').count()")
      .collect().head.getLong(0)
    assert(n == orders + lines)
  }

  test("gremlin: within predicate and dedup") {
    val rows = session.gremlin(
      "g.V().hasLabel('Customer').has('category', within('BUILDING','AUTOMOBILE'))" +
        ".values('category').dedup().order().by()").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("AUTOMOBILE", "BUILDING"))
  }

  test("gremlin: hasId / hasNot / has(k)") {
    val rid = TpchGraph.RegionTag * TpchGraph.Stride
    val byId = session.gremlin(s"g.V().hasId($rid, ${rid + 1}).id().order().by()")
      .collect().map(_.getLong(0)).toSeq
    assert(byId == Seq(rid, rid + 1))
    // acctbal present on Customer/Supplier/Order, absent elsewhere
    val withBal = session.gremlin("g.V().has('acctbal').count()")
      .collect().head.getLong(0)
    val withoutBal = session.gremlin("g.V().hasNot('acctbal').count()")
      .collect().head.getLong(0)
    val all = session.gremlin("g.V().count()").collect().head.getLong(0)
    assert(withBal > 0 && withoutBal > 0 && withBal + withoutBal == all)
  }

  test("gremlin: hasKey conjunction and identity pass-through") {
    // hasKey('a','b') = element carries ALL keys; identity() is a no-op
    val both = session.gremlin("g.V().hasKey('acctbal', 'category').count()")
      .collect().head.getLong(0)
    val viaHas = session.gremlin("g.V().has('acctbal').has('category').count()")
      .collect().head.getLong(0)
    assert(both == viaHas && both > 0)
    val n = session.gremlin("g.V().identity().hasLabel('Region').identity().count()")
      .collect().head.getLong(0)
    assert(n == session.gremlin("g.V().hasLabel('Region').count()")
      .collect().head.getLong(0))
  }

  test("gremlin: bothE/otherV sees both directions") {
    val rid = TpchGraph.RegionTag * TpchGraph.Stride
    // region 0 has only incoming IN_REGION edges; bothE still reaches them
    val nbrs = session.gremlin(
      s"g.V().hasId($rid).bothE('IN_REGION').otherV().id().order().by()")
      .collect().map(_.getLong(0)).toSeq
    val exp = spark.read.parquet(s"$sf/nation.parquet")
      .filter(org.apache.spark.sql.functions.col("n_regionkey") === 0)
      .collect().map(r => TpchGraph.NationTag * TpchGraph.Stride +
        r.getAs[Number]("n_nationkey").longValue).toSeq.sorted
    assert(nbrs == exp && nbrs.nonEmpty)
  }

  test("gremlin: elementMap returns id, label and keys") {
    val r = session.gremlin(
      "g.V().hasLabel('Region').elementMap('name').order().by('elementMap').limit(1)")
      .collect().head.getStruct(0)
    assert(r.getLong(r.fieldIndex("id")) == TpchGraph.RegionTag * TpchGraph.Stride)
    assert(r.getString(r.fieldIndex("label")) == "Region")
    assert(r.getString(r.fieldIndex("name")).nonEmpty)
  }

  test("gremlin: E() edge scan and inV/outV sides") {
    val nEdges = session.gremlin("g.E().count()").collect().head.getLong(0)
    assert(nEdges == TpchGraph(spark, sf).edges.count())
    val rels = session.gremlin("g.E('IN_REGION').label().dedup().order().by()")
      .collect().map(_.getString(0)).toSeq
    assert(rels == Seq("IN_REGION"))
    // E().outV() lands on sources (nations), E().inV() on targets (regions)
    val srcs = session.gremlin("g.E('IN_REGION').outV().id().dedup().count()")
      .collect().head.getLong(0)
    val dsts = session.gremlin("g.E('IN_REGION').inV().id().dedup().count()")
      .collect().head.getLong(0)
    assert(srcs == 25L && dsts == 5L)
    // outE().outV() stays at the source
    val back = session.gremlin(
      "g.V().hasLabel('Nation').outE('IN_REGION').outV().label().dedup().order().by()")
      .collect().map(r => r.get(0).toString).toSeq
    assert(back.nonEmpty)
  }

  test("gremlin: and/or/not boolean steps") {
    val a = session.gremlin(
      "g.V().and(hasLabel('Customer'), has('acctbal', gt(9000.0))).count()")
      .collect().head.getLong(0)
    val exp = spark.read.parquet(s"$sf/customer.parquet")
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 9000.0).count()
    assert(a == exp)
    val b = session.gremlin(
      "g.V().or(hasLabel('Region'), hasLabel('Nation')).count()")
      .collect().head.getLong(0)
    assert(b == 30L)
    val c = session.gremlin(
      "g.V().hasLabel('Region').not(has('name', 'ASIA')).count()")
      .collect().head.getLong(0)
    assert(c == 4L)
  }

  test("gremlin: union of expansions") {
    // customers reach nations via FROM_NATION; union with in('PLACED_BY')
    // adds their orders — counts add up
    val u = session.gremlin(
      "g.V().hasLabel('Customer').union(out('FROM_NATION'), in('PLACED_BY')).count()")
      .collect().head.getLong(0)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val nOrd = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(u == nCust + nOrd)
  }

  test("gremlin: choose projects by predicate") {
    val rows = session.gremlin(
      "g.V().hasLabel('Customer').choose(has('acctbal', gt(0.0)), constant('pos'), constant('neg'))" +
        ".dedup().order().by()").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("neg", "pos"))
  }

  test("gql: INSERT patterns and statement routing") {
    val g2 = session.gqlUpdate(
      "INSERT (:Hub {id: 999, name: 'h'}), (:Hub {id: 998, name: 'i'})")
    val c = new GraftSession(spark, g2)
      .gql("MATCH (h:Hub) RETURN count(*) AS c").collect().head.getLong(0)
    assert(c == 2L)
    val e = intercept[IllegalArgumentException](
      session.gql("INSERT (:Hub {id: 997, name: 'x'})"))
    assert(e.getMessage.contains("gqlUpdate"))
  }

  test("gql: CREATE VECTOR INDEX builds LSH and IVF indexes") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val lsh = session.createVectorIndex(
      "CREATE VECTOR INDEX e1 ON Embedding(embedding) USING LSH OPTIONS(bits 8, tables 2)",
      emb, "vec_id").collect().head
    assert(lsh.getString(0) == "e1" && lsh.getString(1) == "lsh")
    assert(lsh.getLong(2) == emb.count() * 2) // one row per (vector, table)
    val ivf = session.createVectorIndex(
      "CREATE VECTOR INDEX e2 ON Embedding(embedding) USING IVF OPTIONS(nlist 4, iters 1)",
      emb, "vec_id").collect().head
    assert(ivf.getString(1) == "ivf" && ivf.getLong(2) == emb.count())
    assert(session.vectorIndex("e1").isDefined)
    assert(session.vectorIndex("e2").flatMap(_.model).exists(_.nlist == 4))
    // cells cover the corpus: every assignment in [0, nlist)
    val cells = session.vectorIndex("e2").get.buckets
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c2 => c2 >= 0 && c2 < 4))
    // HNSW builds per-partition graphs and searches via the stored index
    val hnsw = session.createVectorIndex(
      "CREATE VECTOR INDEX e3 ON Embedding(embedding) USING HNSW OPTIONS(m 8)",
      emb, "vec_id").collect().head
    assert(hnsw.getString(1) == "hnsw" && hnsw.getLong(2) == emb.count())
    val idx = session.vectorIndex("e3").flatMap(_.hnsw).get
    val got = graft.vector.Hnsw.searchIndex(idx,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 2),
      "vec_id", "embedding", k = 3).collect()
    assert(got.length == 6) // 2 queries x top-3
    val err = intercept[IllegalArgumentException](
      session.gql("CREATE VECTOR INDEX e4 ON X(y) USING FLANN"))
    assert(err.getMessage.nonEmpty)
  }

  test("vectorSearch queries registered indexes of every method") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    val brute = graft.vector.Knn.bruteForceTopK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((ddl, name) <- Seq(
        ("CREATE VECTOR INDEX s1 ON E(embedding) USING LSH OPTIONS(bits 4, tables 8)", "s1"),
        ("CREATE VECTOR INDEX s2 ON E(embedding) USING IVF OPTIONS(nlist 4, nprobe 3)", "s2"),
        ("CREATE VECTOR INDEX s3 ON E(embedding) USING HNSW", "s3"))) {
      session.createVectorIndex(ddl, emb, "vec_id")
      val got = session.vectorSearch(name, q, "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty, s"$name returned nothing")
      val overlap = (brute & got).size.toDouble / brute.size
      info(f"$name%-3s overlap vs brute = $overlap%.2f")
      assert(overlap >= 0.5, s"$name overlap $overlap too low")
    }
    val bad = intercept[IllegalArgumentException](
      session.vectorSearch("nope", q, "vec_id", "embedding", 1))
    assert(bad.getMessage.contains("unknown vector index"))
  }

  test("vectorSearch min_similarity / max_distance thresholds filter results") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    session.createVectorIndex(
      "CREATE VECTOR INDEX st ON E(embedding) USING LSH OPTIONS(bits 4, tables 8)",
      emb, "vec_id")
    val all = session.vectorSearch("st", q, "vec_id", "embedding", k = 5).collect()
    val cut = all.map(_.getDouble(2)).sorted.apply(all.length / 2) // median score
    val filtered = session.vectorSearch("st", q, "vec_id", "embedding", k = 5,
      minScore = Some(cut)).collect()
    assert(filtered.nonEmpty && filtered.length < all.length)
    assert(filtered.forall(_.getDouble(2) >= cut))

    // distance thresholding on a distance-metric index (DDL metric option,
    // reference CreateVectorIndexStatement.metric): score = -distance, so
    // max_distance v keeps score >= -v
    session.createVectorIndex(
      "CREATE VECTOR INDEX sd ON E(embedding) USING HNSW OPTIONS(metric l2)",
      emb, "vec_id")
    val dAll = session.vectorSearch("sd", q, "vec_id", "embedding", k = 5).collect()
    assert(dAll.forall(_.getDouble(2) <= 0), "l2 scores are negated distances")
    val dCut = -dAll.map(_.getDouble(2)).sorted.apply(dAll.length / 2)
    val dF = session.vectorSearch("sd", q, "vec_id", "embedding", k = 5,
      maxDist = Some(dCut)).collect()
    assert(dF.nonEmpty && dF.length < dAll.length)
    assert(dF.forall(-_.getDouble(2) <= dCut))

    // non-hnsw methods are cosine-only — metric rejected at parse
    val mbad = intercept[IllegalArgumentException](
      session.gql("CREATE VECTOR INDEX sx ON E(y) USING LSH OPTIONS(metric l2)"))
    assert(mbad.getMessage.contains("cosine"))
  }

  test("graphql: mutation routing and delete semantics") {
    val g1 = session.graphqlMutation(
      """mutation { createHub(id: 999, name: "h", acctbal: 1.5) { id } }""")
    val s1 = new GraftSession(spark, g1)
    val r = s1.graphql("{ Hub { id name acctbal } }").collect().head
    assert(r.getLong(0) == 999L && r.getString(1) == "h" && r.getDouble(2) == 1.5)
    val g2 = s1.graphqlMutation("""mutation { deleteHub(id: 999) { id } }""")
    assert(new GraftSession(spark, g2).graphql("{ Hub { id } }").collect().isEmpty)
    val e = intercept[IllegalArgumentException](
      session.graphql("""mutation { createHub(id: 1) { id } }"""))
    assert(e.getMessage.contains("graphqlMutation"))
    assertThrows[IllegalArgumentException](
      session.graphqlMutation("""mutation { renameHub(id: 1) { id } }"""))
  }

  test("gremlin: P and TextP predicates") {
    import org.apache.spark.sql.functions.col
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // without = complement of within
    val without = session.gremlin(
      "g.V().hasLabel('Customer').has('category', without('BUILDING','AUTOMOBILE')).count()")
      .collect().head.getLong(0)
    assert(without == cust.filter(!col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).count())
    // P.between is [lo, hi); inside is (lo, hi); outside is the complement of [lo, hi]
    val between = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', P.between(0, 1000)).count()")
      .collect().head.getLong(0)
    assert(between == cust.filter(col("c_acctbal") >= 0 && col("c_acctbal") < 1000).count())
    val inside = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', inside(0, 1000)).count()")
      .collect().head.getLong(0)
    assert(inside == cust.filter(col("c_acctbal") > 0 && col("c_acctbal") < 1000).count())
    val outside = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', outside(0, 1000)).count()")
      .collect().head.getLong(0)
    assert(outside == cust.filter(col("c_acctbal") < 0 || col("c_acctbal") > 1000).count())
    assert(between + outside == cust.count())
    // TextP string predicates
    val containing = session.gremlin(
      "g.V().hasLabel('Customer').has('name', TextP.containing('001')).count()")
      .collect().head.getLong(0)
    assert(containing == cust.filter(col("c_name").contains("001")).count() && containing > 0)
    val starting = session.gremlin(
      "g.V().hasLabel('Nation').has('name', startingWith('NATION_1')).values('name').order().by()")
      .collect().map(_.getString(0)).toSeq
    assert(starting.nonEmpty && starting.forall(_.startsWith("NATION_1")))
    val ending = session.gremlin(
      "g.V().hasLabel('Nation').has('name', endingWith('_7')).count()")
      .collect().head.getLong(0)
    assert(ending == 1L)
    val rx = session.gremlin(
      "g.V().hasLabel('Nation').has('name', regex('^NATION_1.*')).count()")
      .collect().head.getLong(0)
    assert(rx == starting.size)
    // composite predicates: P.and / P.or / P.not
    val banded = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', P.and(gt(0), lt(1000))).count()")
      .collect().head.getLong(0)
    assert(banded == inside)
    val either = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', P.or(lt(0), gt(1000))).count()")
      .collect().head.getLong(0)
    assert(either == outside)
    val negated = session.gremlin(
      "g.V().hasLabel('Customer').has('acctbal', P.not(between(0, 1000))).count()")
      .collect().head.getLong(0)
    assert(negated == cust.count() - between)
  }

  test("gremlin: filter() step is where()") {
    val a = session.gremlin(
      "g.V().hasLabel('Customer').filter(has('category', 'BUILDING')).count()")
      .collect().head.getLong(0)
    val b = session.gremlin(
      "g.V().hasLabel('Customer').where(has('category', 'BUILDING')).count()")
      .collect().head.getLong(0)
    assert(a == b && a > 0)
  }

  test("gremlin: parse errors") {
    assertThrows[IllegalArgumentException](GremlinFrontend.parseSteps("h.V()"))
    assertThrows[IllegalArgumentException](GremlinFrontend.parseSteps("g.V("))
    assertThrows[IllegalArgumentException](GremlinFrontend.translate("g.V().bogus()"))
  }

  test("graphql: scalar ids and parse errors") {
    val rows = session.graphql("""{ Region { id name } }""").collect()
    assert(rows.length == 5)
    assertThrows[IllegalArgumentException](GraphQLFrontend.parse("Region { name }"))
    assertThrows[IllegalArgumentException](GraphQLFrontend.parse("{ Region { name }"))
  }

  test("gql: UNION routes through the multi-statement grammar") {
    val got = session.gql(
      """MATCH (c:Customer) WHERE c.acctbal > 9900.0 RETURN c.name AS nm
        |UNION
        |MATCH (c:Customer) WHERE c.acctbal > 9500.0 RETURN c.name AS nm""".stripMargin)
      .orderBy("nm").collect().map(_.getString(0)).toSeq
    val exp = session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > 9500.0 RETURN c.name AS nm ORDER BY nm")
      .collect().map(_.getString(0)).toSeq
    assert(got == exp && got.nonEmpty)
  }

  test("gql: CREATE GRAPH registers a catalog graph with the session schema") {
    val summary = session.gql("CREATE GRAPH staging").collect()
    assert(summary.head.getString(0) == "staging")
    val g = session.graphNamed("staging").get
    assert(g.nodes.columns.sameElements(session.graph.nodes.columns))
    assert(g.nodes.count() == 0 && g.edges.count() == 0)
    // contents arrive through the usual functional-mutation surface
    val s2 = session.sessionFor("staging")
    session.updateGraph("staging",
      s2.gqlUpdate("INSERT (:Hub {id: 1, name: 'h1'})"))
    val c = session.sessionFor("staging")
      .gql("MATCH (h:Hub) RETURN count(*) AS c").collect().head.getLong(0)
    assert(c == 1L)
    // LIKE copies another cataloged graph's schema; duplicates are rejected
    session.gql("CREATE GRAPH staging2 LIKE staging")
    assert(session.graphNamed("staging2").isDefined)
    val dup = intercept[IllegalArgumentException](session.gql("CREATE GRAPH staging"))
    assert(dup.getMessage.contains("already exists"))
  }

  test("gql shares cypher surface") {
    val a = session.gql("MATCH (r:Region) RETURN r.name AS n ORDER BY n").collect()
    val b = session.cypher("MATCH (r:Region) RETURN r.name AS n ORDER BY n").collect()
    assert(a.map(_.getString(0)).toSeq == b.map(_.getString(0)).toSeq)
  }
}

class GremlinSelectSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("select without by returns ids; with by returns props") {
    val withBy = session.gremlin(
      "g.V().hasLabel('Supplier').as('s').out('FROM_NATION').as('n')" +
        ".select('s', 'n').by('name').by('name')").collect()
    assert(withBy.nonEmpty)
    assert(withBy.head.getString(0).startsWith("Supplier#"))
    val ids = session.gremlin(
      "g.V().hasLabel('Supplier').as('s').out('FROM_NATION').as('n').select('s', 'n')")
      .collect()
    assert(ids.head.getLong(0) >= 3000000000000L)
  }

  test("path length equals hop count + 1") {
    val rows = session.gremlin(
      "g.V().hasLabel('Customer').out('FROM_NATION').out('IN_REGION').path()").collect()
    assert(rows.forall(_.getSeq[Long](0).length == 3))
  }

  test("select of unknown alias fails") {
    assertThrows[IllegalArgumentException](
      session.gremlin("g.V().hasLabel('Nation').select('zz')"))
  }
}

class MergeOnSetSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("ON CREATE SET applies only to created, ON MATCH SET only to matched") {
    val g1 = session.cypherUpdate(
      "MERGE (r:Region {name: 'ASIA', id: 555}) ON CREATE SET r.category = 'new' ON MATCH SET r.category = 'seen'")
    val asia = g1.nodes.filter(org.apache.spark.sql.functions.col("name") === "ASIA")
      .collect().head
    assert(asia.getAs[String]("category") == "seen")
    val g2 = session.cypherUpdate(
      "MERGE (r:Region {name: 'ATLANTIS', id: 556}) ON CREATE SET r.category = 'new' ON MATCH SET r.category = 'seen'")
    val atl = g2.nodes.filter(org.apache.spark.sql.functions.col("name") === "ATLANTIS")
      .collect().head
    assert(atl.getAs[String]("category") == "new")
  }
}

class GremlinEdgeStepSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("outE + values reads edge properties") {
    val rows = session.gremlin(
      "g.V().hasLabel('Supplier').outE('FROM_NATION').values('weight')").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(0) == 1.0))
  }

  test("outE + label returns the edge type") {
    val rows = session.gremlin(
      "g.V().hasLabel('Supplier').outE('FROM_NATION').label().dedup()").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("FROM_NATION"))
  }

  test("outE + inV continues to the target node") {
    val got = session.gremlin(
      "g.V().hasLabel('Supplier').outE('FROM_NATION').inV().values('name').dedup().order().by()")
      .collect().map(_.getString(0)).toSet
    val direct = session.gremlin(
      "g.V().hasLabel('Supplier').out('FROM_NATION').values('name').dedup()")
      .collect().map(_.getString(0)).toSet
    assert(got == direct)
  }

  test("inV before outE is rejected") {
    assertThrows[IllegalArgumentException](
      session.gremlin("g.V().hasLabel('Supplier').inV()"))
  }

  test("cypher properties() returns a sorted property map") {
    val row = session.cypher(
      "MATCH (r:Region) RETURN r.name AS n, properties(r) AS p ORDER BY n LIMIT 1")
      .collect().head
    val m = row.getMap[String, String](1)
    assert(m.keys.toSeq == m.keys.toSeq.sorted)
    assert(m("name") == row.getString(0))
  }
  test("gremlin: constant() replaces the value, keeps cardinality") {
    val rows = session.gremlin("g.V().hasLabel('Region').constant('r').count()")
      .collect().head.getLong(0)
    assert(rows == 5)
    val v = session.gremlin("g.V().hasLabel('Region').constant(7).dedup()")
      .collect().map(_.getLong(0)).toSeq
    assert(v == Seq(7L))
  }

  test("gremlin: bothV() after outE() emits both endpoints") {
    val rid = TpchGraph.RegionTag * TpchGraph.Stride
    val nid = TpchGraph.NationTag * TpchGraph.Stride
    val ids = session.gremlin(
      s"g.V().hasId($nid).outE('IN_REGION').bothV().id().order().by()")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(rid, nid)) // nation 0 is in region 0
    // after bothE it is ambiguous
    val err = intercept[IllegalArgumentException] {
      session.gremlin("g.V().bothE('IN_REGION').bothV().id()")
    }
    assert(err.getMessage.contains("otherV"))
  }

  test("gremlin: optional() moves when matched, stays otherwise") {
    val rid = TpchGraph.RegionTag * TpchGraph.Stride
    val nid = TpchGraph.NationTag * TpchGraph.Stride
    // nation 0 moves to region 0; region 0 has no outgoing edge and stays
    val moved = session.gremlin(
      s"g.V().hasId($nid).optional(out('IN_REGION')).id()")
      .collect().map(_.getLong(0)).toSeq
    assert(moved == Seq(rid))
    val stayed = session.gremlin(
      s"g.V().hasId($rid).optional(out('IN_REGION')).id()")
      .collect().map(_.getLong(0)).toSeq
    assert(stayed == Seq(rid))
    // properties re-bind after the move
    val nm = session.gremlin(
      s"g.V().hasId($nid).optional(out('IN_REGION')).values('name')")
      .collect().head.getString(0)
    assert(nm == "AFRICA")
  }

  test("gremlin: store() snapshots before later filters; cap() reads it back") {
    // store before a stream-shrinking step: the bag is still full
    val r = session.gremlin(
      "g.V().hasLabel('Region').values('name').store('x').limit(1).cap('x')")
      .collect().head.getSeq[String](0)
    assert(r.size == 5 && r == r.sorted)
    // cap of an unknown label is a clear error
    val err = intercept[IllegalArgumentException] {
      session.gremlin("g.V().cap('nope')")
    }
    assert(err.getMessage.contains("no store"))
  }
}

class ValueMapSpec extends AnyFunSuite {
  import TestSpark._

  test("valueMap returns the property map") {
    val session = new GraftSession(spark, TpchGraph(spark, sf))
    val row = session.gremlin("g.V().hasLabel('Region').valueMap().limit(1)")
      .collect().head
    val m = row.getMap[String, String](0)
    assert(m.contains("name"))
  }
}

package graft.frontends.gremlin

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.compiler.Compiler
import graft.graph.{Mutations, PropertyGraph}
import graft.ir.{Expr, Op}

/** Gremlin mutation traversals (reference gremlin/ast.rs addV/addE/property/
  * drop steps) over the functional Mutations executor:
  *
  *   g.addV('Hub').property('id', 999).property('name', 'h')   → CreateNode
  *   g.addE('LINKS').from(V(999)).to(V(42))                    → CreateEdge
  *   g.V().has(…).property('k', v)                             → SetProperty
  *     on every matched node
  *   g.V().has(…).drop()                                       → detach-
  *     delete of every matched node
  *
  * Functional semantics as everywhere in graft: returns the mutated graph.
  * The read prefix of property()/drop() compiles through the ordinary
  * Gremlin translator, so all filter steps compose.
  */
object GremlinUpdates {
  import GremlinFrontend.{Pred, St}

  def run(spark: SparkSession, g: PropertyGraph, query: String): PropertyGraph = {
    val steps = GremlinFrontend.parseSteps(query)
    require(steps.nonEmpty, "empty traversal")
    steps.head.name match {
      case "addV" =>
        val label = steps.head.args.head.asInstanceOf[String]
        val props = steps.tail.map {
          case St("property", Seq(k: String, v)) => k -> v
          case other => throw new IllegalArgumentException(
            s"addV() accepts only property(k, v) steps, got ${other.name}()")
        }
        val id = props.collectFirst {
          case ("id", l: Long) => l
          case ("id", i: Int) => i.toLong
        }.getOrElse(throw new IllegalArgumentException(
          "addV() needs a property('id', <integer>) step"))
        var row = spark.createDataFrame(
            java.util.List.of(Row(id)),
            StructType(Seq(StructField("id", LongType))))
          .withColumn("labels", array(lit(label)))
        for ((k, v) <- props if k != "id") row = row.withColumn(k, lit(v))
        Mutations.createNodes(g, row)

      case "addE" =>
        val rel = steps.head.args.head.asInstanceOf[String]
        def endpoint(name: String): Long = steps.collectFirst {
          case St(`name`, Seq(Pred("V", Seq(l: Long)))) => l
          case St(`name`, Seq(Pred("V", Seq(i: Int)))) => i.toLong
        }.getOrElse(throw new IllegalArgumentException(
          s"addE() needs .$name(V(<id>))"))
        val (src, dst) = (endpoint("from"), endpoint("to"))
        import spark.implicits._
        Mutations.createEdges(g,
          Seq((src, dst, rel)).toDF("src", "dst", "rel"))

      case "V" =>
        val (prefix, action) = (steps.init, steps.last)
        val (op, cur) = GremlinFrontend.translateSteps(prefix)
        val ids = new Compiler(spark, g)
          .compile(Op.Project(op, Seq((Expr.Var(cur): Expr.E, "id"))))
          .distinct()
        action match {
          case St("drop", _) => Mutations.deleteNodesByIds(g, ids, detach = true)
          case St("property", Seq(k: String, v)) =>
            Mutations.setNodePropertyByIds(g, ids, k, lit(v))
          case other => throw new IllegalArgumentException(
            s"mutation traversals must end in drop() or property(k, v), got ${other.name}()")
        }

      case other => throw new IllegalArgumentException(
        s"mutation traversal must start with g.addV()/g.addE()/g.V(), got $other()")
    }
  }
}

package graft.frontends.graphql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.graph.{Mutations, PropertyGraph}

/** GraphQL mutation documents (reference graphql_translator.rs:130) over the
  * functional Mutations executor. The root field name encodes the operation
  * and label:
  *
  *   mutation { createHub(id: 999, name: "h") { id } }    → CreateNode
  *   mutation { updateHub(id: 999, name: "h2") { id } }   → SetProperty per
  *     non-id argument on the node selected by id
  *   mutation { deleteCustomer(category: "X") { id } }    → detach-delete of
  *     every label node matching the equality arguments
  *
  * Functional semantics as everywhere in graft: returns the mutated graph;
  * the selection set is accepted (GraphQL requires one) but the read-back
  * runs through `graphql()` against the returned graph.
  */
object GraphQLMutations {

  def run(spark: SparkSession, g: PropertyGraph, query: String): PropertyGraph = {
    val (isMutation, root) = GraphQLFrontend.parseDocument(query)
    require(isMutation, "not a mutation document; use graphql() for reads")
    val (kind, label) = root.name match {
      case n if n.startsWith("create") && n.length > 6 => ("create", n.drop(6))
      case n if n.startsWith("update") && n.length > 6 => ("update", n.drop(6))
      case n if n.startsWith("delete") && n.length > 6 => ("delete", n.drop(6))
      case other => throw new IllegalArgumentException(
        s"mutation field must be create<Label>/update<Label>/delete<Label>, got $other")
    }
    val args = root.args.toMap

    def asId(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(s"id must be integer, got $other")
    }

    kind match {
      case "create" =>
        val id = asId(args.getOrElse("id",
          throw new IllegalArgumentException(s"create$label needs an id argument")))
        var row = spark.createDataFrame(
            java.util.List.of(Row(id)),
            StructType(Seq(StructField("id", LongType))))
          .withColumn("labels", array(lit(label)))
        for ((k, v) <- root.args if k != "id") row = row.withColumn(k, lit(v))
        Mutations.createNodes(g, row)

      case "update" =>
        val id = asId(args.getOrElse("id",
          throw new IllegalArgumentException(s"update$label selects by id")))
        val ids = g.nodesWithLabel(label).filter(col("id") === id).select("id")
        root.args.filter(_._1 != "id").foldLeft(g) { case (acc, (k, v)) =>
          Mutations.setNodePropertyByIds(acc, ids, k, lit(v))
        }

      case "delete" =>
        val matched = root.args.foldLeft(g.nodesWithLabel(label)) {
          case (df, (k, v)) => df.filter(col(k) === lit(v))
        }
        Mutations.deleteNodesByIds(g, matched.select("id"), detach = true)
    }
  }
}

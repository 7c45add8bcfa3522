package graft.frontends.sparql

import org.apache.spark.sql.SparkSession
import graft.graph.QuadStore

/** SPARQL 1.1 Update graph-management statements over the [[QuadStore]] —
  * the text front-end for the reference's named-graph plan nodes:
  * LoadGraphOp (plan.rs:694-701) and ClearGraph/CreateGraph/DropGraph/
  * CopyGraph/MoveGraph/AddGraph (plan.rs:666-734). Functional semantics like
  * every other graft mutation: returns the updated store.
  *
  * Statements separate with `;` (SPARQL 1.1 Update §3). Data-modifying
  * updates (INSERT DATA / DELETE WHERE / MODIFY) run through the typed
  * TripleGraph API ([[graft.graph.TripleGraph.modify]]); this module covers
  * the graph-management subset that addresses graphs by IRI.
  */
object SparqlUpdates {

  private val Load =
    """(?is)\s*LOAD\s+(?:SILENT\s+)?<([^>]+)>(?:\s+INTO\s+GRAPH\s+<([^>]+)>)?\s*""".r
  private val TwoGraph =
    """(?is)\s*(COPY|MOVE|ADD)\s+(?:SILENT\s+)?(?:GRAPH\s+)?<([^>]+)>\s+TO\s+(?:GRAPH\s+)?<([^>]+)>\s*""".r
  private val OneGraph =
    """(?is)\s*(CLEAR|DROP|CREATE)\s+(?:SILENT\s+)?GRAPH\s+<([^>]+)>\s*""".r

  /** Statement split on `;` — but only OUTSIDE `<...>` IRI delimiters, where
    * semicolons are legal characters (e.g. `LOAD <file:/tmp/a;b.nt>`).
    */
  private[graft] def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inIri = false
    text.foreach {
      case '<' if !inIri => inIri = true; cur += '<'
      case '>' if inIri  => inIri = false; cur += '>'
      case ';' if !inIri => out += cur.result(); cur.clear()
      case c             => cur += c
    }
    out += cur.result()
    out.result()
  }

  def run(spark: SparkSession, store: QuadStore, text: String): QuadStore =
    splitStatements(text).filter(_.trim.nonEmpty).foldLeft(store) { (st, stmt) =>
      stmt match {
        case Load(uri, g)        => st.load(spark, uri, Option(g))
        case TwoGraph(op, s, d)  => op.toUpperCase match {
          case "COPY" => st.copy(s, d)
          case "MOVE" => st.move(s, d)
          case "ADD"  => st.add(s, d)
        }
        case OneGraph(op, g)     => op.toUpperCase match {
          case "CLEAR" | "DROP" => st.clear(g)
          // graph existence is extensional (a graph exists iff it has
          // triples — the reference's create is likewise a catalog no-op
          // until triples arrive)
          case "CREATE"         => st
        }
        case other => throw new IllegalArgumentException(
          s"unsupported SPARQL update statement: ${other.trim.takeWhile(_ != ' ')} " +
            "(supported: LOAD, CLEAR, DROP, CREATE, COPY, MOVE, ADD; " +
            "data updates run through the TripleGraph API)")
      }
    }
}

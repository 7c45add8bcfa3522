package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Worst-case-optimal join (WCOJ) for cyclic patterns — the Spark
  * re-expression of the reference's leapfrog trie join
  * (execution/operators/leapfrog_join.rs, index/ring/leapfrog.rs, cost
  * model optimizer/cost.rs:342-406 `prefer_leapfrog_join`).
  *
  * Binary joins materialize the open wedge set of a triangle query —
  * O(Σ deg²) intermediate rows, the classic blow-up that WCOJ bounds to
  * the AGM output size O(|E|^1.5) (Ngo et al., JACM'18; Veldhuizen's
  * LeapfrogTrieJoin, ICDT'14). The distributed layout is HyperCube /
  * Shares partitioning (Afrati & Ullman, EDBT'10; Beame-Koutris-Suciu):
  * hash each triangle variable into `shares` buckets; a triangle
  * (a, b, c) lives in exactly the cell (h(a), h(b), h(c)), and each
  * edge relation replicates only along its one missing dimension — a
  * `shares`-fold blow-up of the input instead of a quadratic
  * intermediate. Within a cell, the join is the leapfrog step itself:
  * sorted-adjacency intersection per (a, b) candidate.
  *
  * Like the reference (which ships the operator + cost model but does
  * not auto-select it, engine planner.rs:2169), this is an explicit
  * entry point, not a Catalyst strategy swap.
  */
object Wcoj {

  /** Enumerate undirected triangles a < b < c over `edges` (`src`,
    * `dst`). One shuffle of 3·shares·|E| replicated edge rows, then
    * cell-local leapfrog intersection; no wedge materialization
    * anywhere. `shares` is the per-variable bucket count — cells =
    * shares³ — sized so a cell's edges fit in executor memory
    * (expected |E|·3·shares / shares³ rows per cell; skewed hubs are
    * split across shares² cells on their two free dimensions).
    *
    * Sizing `shares`: raise it only when a CELL outgrows executor memory,
    * never for parallelism — the shuffle volume is 3·shares·|E| while the
    * cell-local intersection is near-linear on sparse graphs, so extra
    * shares cost more than they parallelize (measured on the 2M-edge sf10
    * part DAG at local[32]: shares 2/3/4 → 26/43/34 s; replication
    * dominates, the default stays 2).
    */
  def triangles(edges: DataFrame, shares: Int = 2): DataFrame = {
    require(shares >= 1, s"shares must be >= 1, got $shares")
    val spark = edges.sparkSession
    import spark.implicits._
    val p = shares

    // symmetric closure (undirected view), self-loops dropped
    val ue = edges.select(col("src").cast("long").as("x"), col("dst").cast("long").as("y"))
      .unionByName(edges.select(col("dst").cast("long").as("x"), col("src").cast("long").as("y")))
      .filter(col("x") =!= col("y"))
      .distinct()

    def h(c: org.apache.spark.sql.Column) = pmod(hash(c), lit(p))
    val reps = spark.range(p).select(col("id").cast("int").as("rep"))

    // Pattern edges over variable order a < b < c:
    //   rel 0: (a, b)  — replicate along the c dimension
    //   rel 1: (b, c)  — replicate along the a dimension
    //   rel 2: (a, c)  — replicate along the b dimension
    // (the third triangle side is the a–c edge; keying it by `a` makes
    // the cell-local step a pure sorted intersection on c)
    val r0 = ue.crossJoin(reps).select(lit(0).as("rel"), col("x"), col("y"),
      (h(col("x")) * (p * p) + h(col("y")) * p + col("rep")).cast("int").as("pid"))
    val r1 = ue.crossJoin(reps).select(lit(1).as("rel"), col("x"), col("y"),
      (col("rep") * (p * p) + h(col("x")) * p + h(col("y"))).cast("int").as("pid"))
    val r2 = ue.crossJoin(reps).select(lit(2).as("rel"), col("x"), col("y"),
      (h(col("x")) * (p * p) + col("rep") * p + h(col("y"))).cast("int").as("pid"))

    r0.unionByName(r1).unionByName(r2)
      .repartition(p * p * p, col("pid"))
      .as[(Int, Long, Long, Int)]
      .mapPartitions { it =>
        // A Spark partition may hold several HyperCube cells (hash
        // collisions on pid) — group by pid so each cell joins only
        // with itself; merging cells would double-count triangles
        // found in their own proper cell.
        import scala.collection.mutable.{ArrayBuffer, HashMap}
        type Adj = HashMap[Long, ArrayBuffer[Long]]
        val byCell = HashMap.empty[Int, (Adj, Adj, Adj)]
        it.foreach { case (rel, x, y, pid) =>
          val (ab, bc, ac) = byCell.getOrElseUpdate(pid,
            (HashMap.empty, HashMap.empty, HashMap.empty))
          val m = rel match { case 0 => ab; case 1 => bc; case _ => ac }
          m.getOrElseUpdate(x, ArrayBuffer.empty) += y
        }
        byCell.valuesIterator.flatMap { case (ab, bc, ac) =>
          // sort adjacency once; each intersection below is a leapfrog
          // seek over two sorted lists
          val sBc = bc.map { case (k, v) => k -> v.sorted.toArray }
          val sAc = ac.map { case (k, v) => k -> v.sorted.toArray }
          ab.iterator.flatMap { case (a, bs) =>
            sAc.get(a) match {
              case None => Iterator.empty[(Long, Long, Long)]
              case Some(cas) =>
                bs.iterator.filter(_ > a).flatMap { b =>
                  sBc.get(b) match {
                    case None => Iterator.empty[(Long, Long, Long)]
                    case Some(cbs) =>
                      val out = ArrayBuffer.empty[(Long, Long, Long)]
                      var i = 0; var j = 0
                      while (i < cas.length && j < cbs.length) {
                        val cv = cas(i); val cw = cbs(j)
                        if (cv == cw) {
                          if (cv > b) out += ((a, b, cv))
                          i += 1; j += 1
                        } else if (cv < cw) i += 1
                        else j += 1
                      }
                      out.iterator
                  }
                }
            }
          }
        }
      }
      .toDF("a", "b", "c")
  }
}

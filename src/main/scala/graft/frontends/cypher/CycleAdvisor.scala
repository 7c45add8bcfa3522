package graft.frontends.cypher

import org.apache.spark.sql.DataFrame

/** Cost gate for the cyclic-pattern split (Cypher.scala `splitCycle`,
  * conf `spark.graft.cypher.cycleSplit`). The reference never
  * auto-selects its leapfrog operator (planner.rs:2169) because its
  * planner carries no cost model for it; graft's sessions default to
  * `auto` — this advisor's per-pattern fanout margin decides, with the
  * decision hash-pinned result-identical at sf0.01/0.1/1 and a
  * row-identical sf10 probe (CycleSplitSpec, scale/SCALE_GATE.md).
  * Mechanics: when a translated pattern QUALIFIES for the split, the
  * frontend notes it here; the session (which has the graph) evaluates a
  * fanout estimate and re-translates with the winning patterns forced
  * when the margin holds. Under an explicit `off` the same notes only
  * LOG a proposal — the plan never changes.
  *
  * Estimate model: average out-fanout f = |E|/|V| from Catalyst
  * logical-plan statistics (rowCount under CBO, else sizeInBytes over the
  * schema's default row width — driver-side only, no job). A left-to-right
  * chain build of an m-hop cycle peaks at ~f^(m-1) rows per anchor row;
  * the split's two arms peak at ~f^ceil(m/2) each. Proposal fires when
  * chain > 4 × split — the 4× margin absorbs the estimate's crudeness and
  * the split's extra mid-join.
  *
  * Thread-local hand-off: translation and compilation run on the same
  * thread (`compiler.compile(CypherFrontend.translateText(q))`), and
  * per-thread state keeps concurrent sessions from cross-proposing.
  */
object CycleAdvisor {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.cypher.cycleSplit")

  private val pending = new ThreadLocal[List[Int]] {
    override def initialValue: List[Int] = Nil
  }
  private val last = new ThreadLocal[Option[String]] {
    override def initialValue: Option[String] = None
  }
  // `cycleSplit=auto` re-translation override: NOT cleared by reset() —
  // it brackets exactly one translateText call (which itself resets), so
  // clearing it there would undo the auto decision before it applies.
  // Holds the hop counts whose own margin won: a multi-pattern query can
  // carry one cycle that clears the margin and another that loses, and
  // re-translating must split only the winners (a blanket "split every
  // structurally qualifying pattern" would pessimize the sub-margin one).
  private val force = new ThreadLocal[Set[Int]] {
    override def initialValue: Set[Int] = Set.empty
  }

  /** Hop counts the auto decision licensed for splitting in the current
    * [[withForced]] re-translation (empty = not inside one) — the frontend
    * splits exactly the patterns whose hop count is in this set.
    */
  def forcedHops: Set[Int] = force.get

  /** Run `f` (a single re-translation) with the split force-enabled for
    * patterns of exactly these hop counts.
    */
  def withForced[T](wins: Set[Int])(f: => T): T = {
    force.set(wins)
    try f finally force.remove()
  }

  /** Frontend: an m-hop pattern qualified for the split while the flag was
    * off.
    */
  def noteQualifying(hops: Int): Unit = pending.set(hops :: pending.get)

  /** Called at translation entry: clears notes a previous translation left
    * behind after throwing before any compile consumed them (pooled threads
    * would otherwise evaluate them against an unrelated query's graph).
    * ThreadLocal.remove also releases the slot on pooled threads.
    */
  def reset(): Unit = { pending.remove(); last.remove() }

  /** The most recent proposal logged on this thread (spec hook). */
  def lastProposal: Option[String] = last.get

  private def approxRows(df: DataFrame): Double = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.toDouble).getOrElse(
      stats.sizeInBytes.toDouble / math.max(1, df.schema.defaultSize))
  }

  /** The shared cost model: does the split win by the 4× margin for an
    * m-hop cycle at estimated fanout f?
    */
  private def marginWins(f: Double, m: Int): Boolean = {
    val chain = math.pow(f, m - 1.0)
    // the two arms peak at f^ceil(m/2) and f^floor(m/2) (the split point
    // is k = m/2 rounded down; the larger arm dominates)
    val split = math.pow(f, math.ceil(m / 2.0)) + math.pow(f, m / 2)
    chain > 4.0 * split
  }

  private def fanout(nodes: DataFrame, edges: DataFrame): Double =
    math.max(1.0,
      math.max(1.0, approxRows(edges)) / math.max(1.0, approxRows(nodes)))

  /** Compiler: evaluate any pending qualifying patterns against the graph
    * being compiled; log (never enable) when the split estimate wins.
    */
  def evaluate(nodes: DataFrame, edges: DataFrame): Unit = {
    val qs = pending.get
    if (qs.isEmpty) return
    pending.set(Nil)
    val f = fanout(nodes, edges)
    qs.foreach { m =>
      if (marginWins(f, m)) {
        val msg =
          f"cycle-split proposal: $m%d-hop cyclic pattern, est. fanout $f%.1f — " +
            f"chain build peaks ~f^${m - 1}%d vs split arms ~2·f^${math.ceil(m / 2.0).toInt}%d; " +
            "set spark.graft.cypher.cycleSplit=true to enable (kept off for reference parity)"
        log.info(msg)
        last.set(Some(msg))
      }
    }
  }

  /** `cycleSplit=auto` decision point (called by the session between the
    * probe translation and compilation): consume the probe's notes and
    * return the hop counts whose qualifying patterns clear the same 4×
    * margin the off-mode proposal uses — the caller re-translates under
    * [[withForced]] when the set is non-empty, and the frontend splits
    * ONLY patterns of those hop counts (a sub-margin cycle in the same
    * query keeps its chain plan). Same estimate, same margin; the only
    * difference from `evaluate` is that a winning estimate CHANGES the
    * plan instead of only logging, which is what the `auto` opt-in
    * licenses.
    */
  def autoDecide(nodes: DataFrame, edges: DataFrame): Set[Int] = {
    val qs = pending.get
    if (qs.isEmpty) return Set.empty
    pending.set(Nil)
    val f = fanout(nodes, edges)
    val wins = qs.filter(marginWins(f, _)).toSet
    if (wins.nonEmpty)
      log.info(f"cycleSplit=auto: estimate (fanout $f%.1f) clears the 4x " +
        s"margin for ${wins.toSeq.sorted.mkString(",")}-hop cycles - " +
        "enabling the cyclic-pattern split for those patterns")
    wins
  }
}

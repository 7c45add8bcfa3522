package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall seconds.
  *
  * Queries execute through the "noop" sink so the full operator pipeline runs
  * (a bare count() would let Catalyst prune the very expressions being
  * measured). A warm-up pass absorbs session/codegen/parquet-footer init so
  * per-query numbers reflect steady-state throughput.
  */
object Bench {

  /** The window-blessing decision, factored out of `main` so its policy is
    * spec-testable (it refused five r16 windows — load-bearing
    * infrastructure deserves its own tests). A window is blessed into
    * `bench_latest.json` only when BOTH probes say the same thing about
    * host speed (≤10% apart: if speed moved mid-run, no single number
    * describes the window and neither raw nor normalized totals are
    * comparable across rounds) AND their mean is within 1.2× the pinned
    * healthy-window reference (normalization makes a slow-but-STABLE
    * window comparable; a degraded one still must not become the
    * committed record).
    */
  private[graft] final case class Calibration(start: Double, end: Double,
      ref: Double = 1.0) {
    val mean: Double = (start + end) / 2
    def normalized(total: Double): Double = total * ref / math.max(mean, 1e-9)
    val agree: Boolean = {
      val lo = math.min(start, end)
      val hi = math.max(start, end)
      hi / math.max(lo, 1e-9) <= 1.10
    }
    val healthy: Boolean = mean <= 1.2 * ref && agree
    /** Second tier (r17 verdict): a window that passes `healthy` but with a
      * mean probe >1.1× the reference is blessable yet NOT a clean anchor
      * for cross-round normalized comparisons — the r17 blessing sat at
      * mean 1.174 and its "18% normalized improvement" was mostly the probe
      * divisor. The artifact carries this flag so round summaries must
      * quote it instead of presenting a degraded-window number as a
      * like-for-like ledger entry.
      */
    val degraded: Boolean = mean > 1.1 * ref
  }

  /** bless = write bench_latest.json: full catalog only (a filtered run's
    * total is not the headline metric) and only from a healthy window.
    */
  private[graft] def shouldBless(fullCatalog: Boolean, c: Calibration): Boolean =
    fullCatalog && c.healthy

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE stays ON (the at-scale default: runtime coalesce, skew-join);
    // the env override exists for A/B attribution of its fixed per-stage
    // job cost on tiny-SF runs — the committed artifact always runs true.
    val adaptive = sys.env.getOrElse("SPARK_GRAFT_ADAPTIVE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", adaptive)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Scale-gate hook: SPARK_GRAFT_MAX_EDGES=0 forces every adaptive
    // local-vs-distributed split (LocalGraph.maxEdges) down the distributed
    // branch, so the cluster-shaped code paths are benchmarked as the hot
    // path rather than only spec-tested.
    sys.env.get("SPARK_GRAFT_MAX_EDGES").foreach { v =>
      spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, v)
    }
    // Cyclic-pattern split (WCOJ-style cycle evaluation; see Cypher.scala
    // splitCycle) — the session default is `auto` (CycleAdvisor's fanout
    // margin decides per pattern, result-identity hash-pinned at four
    // scale factors); the env override forces `true`/`off` for A/B runs.
    sys.env.get("SPARK_GRAFT_CYCLE_SPLIT").foreach { v =>
      spark.conf.set("spark.graft.cypher.cycleSplit", v)
    }

    // Warm-up: JVM/codegen/shuffle machinery.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // ... and the noop sink every measured query writes through: its first
    // use pays datasource/committer class-init that would otherwise land on
    // whichever query runs first (alphabetically q1_agg — measured ~0.1 s
    // inflation vs its isolated time)
    spark.range(1000).write.format("noop").mode("overwrite").save()

    val startLoadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Machine-speed calibration: the same fixed Spark job (range-sum, all
    // cores, shuffle-free) timed min-of-3. Guest load average cannot see
    // host co-tenancy (r12 measured the SAME code at +30-50% per query
    // between two idle-loadavg windows); this probe gives future rounds a
    // denominator to separate machine drift from plan regressions.
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // ... and a shuffle-shaped probe: the pure range-sum is CPU-bound and
    // blind to the memory-bandwidth/scheduling contention that actually
    // moves Spark stage times between host windows. Probed at window START
    // and again at window END (r15 post-mortem: two single-probe windows
    // disagreed about host speed by ~12% — more than the round-over-round
    // delta the normalization exists to measure — producing a raw-faster/
    // normalized-slower split-brain). The artifact records both; blessing
    // requires they AGREE (host speed stable across the whole window) and
    // normalization divides by their mean. Probe-context parity matters as
    // much as timing: both probes run against an EMPTY block manager (start
    // = before the fixture caches build; end = after the terminal
    // double-GC drain) and both take the min over two 3-sample rounds —
    // otherwise probe-context bias (cache occupancy, JIT depth) reads as
    // host drift and healthy windows are refused.
    def shuffleProbe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(20000000L).selectExpr("id % 1000000 as k")
        .groupBy("k").count().selectExpr("sum(count)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val calibShuffleStart = math.min(shuffleProbe(), shuffleProbe())

    // Fixture warm-up AFTER the start probe (probe-context parity — see
    // above): parquet footers of every table, then the persisted fixture
    // graphs, so the first catalog query to touch each fixture doesn't pay
    // its build+cache cost.
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => }
    }
    try {
      graft.graph.TpchGraph(spark, sfDir).nodes.count()
      graft.graph.TpchGraph(spark, sfDir).edges.count()
      graft.graph.TpchGraph.partDag(spark, sfDir).nodes.count()
      graft.graph.TpchGraph.partDag(spark, sfDir).edges.count()
    } catch { case _: Throwable => }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    var lastClean = System.nanoTime()
    // Per-query time = min over `reps` back-to-back executions. One-shot
    // timings showed multi-second outliers landing on DIFFERENT queries in
    // otherwise-identical runs (GC pauses, storage eviction, OS jitter — at
    // sf0.1 every query is sub-3s, so a single stall doubles a number). The
    // min is the steady-state throughput of the plan itself, the quantity
    // the reference's warm embedded numbers (BASELINE.md) report.
    // reps < 1 would skip measurement entirely and record Double.MaxValue
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // Every observed rep time per query, pooled across first and second
    // pass. The reported number is the pooled min; its CREDIBILITY is the
    // spread = 2nd-best / best — when the two fastest independent samples
    // agree within 1.5x, a single outlier rep cannot have become the
    // committed record (r12 shipped q_mut_edge_set at 1.22 s vs its 0.64 s
    // steady state from exactly that: min-of-2 with a cold rep-1 on a
    // temp-store fixture leaves ONE effective sample).
    val samples = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def spreadOf(name: String): Double = {
      val s = samples.getOrElse(name, scala.collection.mutable.ArrayBuffer.empty[Double]).sorted
      if (s.size < 2) Double.MaxValue else s(1) / math.max(s(0), 1e-9)
    }
    val SpreadBar = 1.5
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val ts = samples.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty[Double])
      def once(): Unit = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a crashing query must not masquerade as a fast one
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        ts += (System.nanoTime() - t0) / 1e9
      }
      var r = 0
      while (r < reps && !errors.contains(name)) { once(); r += 1 }
      // adaptive corroboration: a min whose nearest neighbor is >1.5x away
      // is one GC pause / cold temp-store rep away from being wrong — buy
      // up to two more samples before trusting it (covers per-run fixture
      // queries without a hand-maintained list: their cold rep-1 trips the
      // spread, the extra warm reps corroborate the steady state).
      // reps=1 is an explicit "fast single-shot" request — a lone sample
      // always has infinite spread, so the loop must not override it.
      var extra = 0
      while (reps > 1 && extra < 2 && !errors.contains(name) &&
          spreadOf(name) > SpreadBar) {
        once(); extra += 1
      }
      if (ts.isEmpty) Double.MaxValue else ts.min
    }
    // 140+ queries × iterative localCheckpoints accumulate storage blocks
    // whose release waits on driver GC (ContextCleaner is reference-based).
    // Left alone, the pile-up evicts later queries' execution memory and a
    // natural full GC stalls whichever query it lands on — so drive the GC
    // HERE, between queries, where the pause is attributed to no query.
    // (A periodic-GC config stalls mid-query: measured 25 s outliers.)
    // Unconditional: round-5 data showed the elapsed/heap-triggered variant
    // still let neighborhood effects inflate bench times 2-5x over the same
    // query's isolated time (both min-of-reps executions run back-to-back in
    // the same polluted context, so min() can't remove them).
    def cleanContext(): Unit = {
      System.gc()
      Thread.sleep(150) // let the async ContextCleaner drain unpersists
      lastClean = System.nanoTime()
    }
    // optional query-name filter (local iteration; the driver passes none)
    val only = args.toSet
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .map { case (name, fn) =>
        val sec = measure(name, fn)
        cleanContext()
        name -> sec
      }.toMap
    // Second pass: re-measure the slowest queries in a settled context and
    // keep the min. Whatever pollution survives the per-query GC (evicted
    // broadcast state, checkpoint-block churn from a heavy neighbor) lands on
    // arbitrary queries; their clean-context steady-state time is the number
    // comparable across rounds (and to ProfileHeavy isolation). Top 20 (was
    // 8, r17): the streaming/tx heavies are the most window-sensitive family
    // — the r16 verdict's widest unexplained swings all sat in ranks 9-20 —
    // and doubling their sample count is ~30 s on an ~8 min run.
    val recheck = firstPass.filterNot { case (n, _) => errors.contains(n) }
      .toSeq.sortBy(-_._2).take(20).map(_._1)
    val secondPass = recheck.map { name =>
      cleanContext()
      name -> math.min(firstPass(name), measure(name, SparkEntry.queries(name)))
    }.toMap
    val results = firstPass.keys.toSeq.sorted.map { name =>
      val sec = secondPass.getOrElse(name, firstPass(name))
      name -> (if (errors.contains(name)) -sec else sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2.abs).sum
    // per-query rep spread (2nd-best / best over all pooled samples) and
    // the queries whose final spread still exceeds the bar after the
    // adaptive extra reps — a committed artifact with a non-empty flag
    // list contains at least one number with NO corroborating sample
    val spreads = results.map { case (n, _) =>
      n -> (if (errors.contains(n)) Double.NaN else spreadOf(n))
    }
    val flagged = spreads.collect {
      case (n, s) if !s.isNaN && s != Double.MaxValue && s > SpreadBar => n
    }
    val spreadJson = spreads.collect { case (n, s) if !s.isNaN && s != Double.MaxValue =>
      "\"" + n + "\":" + (math.rint(s * 100) / 100)
    }.mkString("{", ",", "}")
    val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    // END-of-window probe: same job, measured after the catalog ran, in a
    // GC-cleaned context so catalog residue doesn't masquerade as host
    // slowdown. Hygiene is stricter than the between-queries clean: two GC
    // passes with a full drain pause (the ContextCleaner releases checkpoint
    // blocks asynchronously — probing into that churn reads the CLEANUP as
    // host slowdown), and min-of-5 instead of min-of-3 (the end probe is
    // the single gate on blessing; an extra 2 runs is cheap insurance
    // against one GC-straddling sample).
    cleanContext()
    Thread.sleep(850)
    cleanContext()
    val calibShuffleEnd = math.min(shuffleProbe(), shuffleProbe())
    // machine-drift-normalized total: the shuffle calibration probes track
    // the host co-tenancy factor (same binary measured 96.7-153 s across
    // windows in r12), so totals are comparable across rounds as
    // total × (REF / mean(start, end)) against the pinned healthy-window
    // reference probe time (~1.0 s on this machine class)
    // decision policy lives in [[Calibration]] (spec-tested); this block
    // only feeds it the measured probes. A refused run still reports
    // (stdout + /tmp) so the caller can retry.
    val calibration = Calibration(calibShuffleStart, calibShuffleEnd)
    val CalibShuffleRef = calibration.ref
    val calibShuffle = calibration.mean
    val valueNormalized = calibration.normalized(total)
    val calibAgree = calibration.agree
    val calibHealthy = calibration.healthy
    // environment fingerprint: rep count + machine state, so future rounds
    // can tell methodology/noise from genuine regression without forensics
    // (r11's committed 117.9 s vs snapshot 124.7 s was exactly that gap)
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
    // the compact stdout line lives inside the driver's ~2000-char tail
    // budget — a noisy window could flag dozens of names and truncate the
    // line mid-JSON, so the compact form carries only the COUNT; the full
    // committed artifact carries the names and per-query spreads
    val envJson =
      s""""reps":$reps,"cpus":$cpus,"load_avg_start":${math.rint(startLoadAvg * 100) / 100},"load_avg_end":${math.rint(loadAvg * 100) / 100},"heap_gb":$heapGb,"calib_sec":${math.rint(calib * 1000) / 1000},"calib_shuffle_sec":${math.rint(calibShuffle * 1000) / 1000},"calib_start":${math.rint(calibShuffleStart * 1000) / 1000},"calib_end":${math.rint(calibShuffleEnd * 1000) / 1000},"calib_agree":$calibAgree,"calib_shuffle_ref":$CalibShuffleRef,"calib_healthy":$calibHealthy,"calib_degraded":${calibration.degraded},"value_normalized":${math.rint(valueNormalized * 1000) / 1000},"spread_flagged_n":${flagged.size}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,$envJson,"spread_flagged":$flaggedJson,"spreads":$spreadJson,"sf":"$sfDir"}"""
    // The driver captures only a ~2000-char tail of stdout, so a full
    // 180-query JSON line is truncated mid-line and fails its parse (every
    // BENCH_r{N}.json since r7 has "parsed": null). Print a COMPACT line —
    // BASELINE.md's headline queries plus total/errors, rounded to ms —
    // that fits the tail budget; the full per-query detail is durable in
    // bench_latest.json (committed) and /tmp/graft_bench.json.
    val headline = Seq(
      "q1_agg", "q_tpch_q3", "q_tpch_q5", "q_tpch_q10",
      "q_pagerank", "q_louvain", "q_triangles", "q_connected_components",
      "q_scc", "q_shortest_path", "q_dfs", "q_expand_2hop", "q_sssp",
      "q_betweenness", "q_cypher_match", "q_cypher_triangle",
      "q_sparql_select", "q_gremlin_traversal", "q_wcoj_triangle",
      "q_knn_brute", "q_knn_hnsw", "q_knn_lsh", "q_knn_ivf",
      "q_dedup_exact", "q_neardup_verified", "q_decontaminate",
      "q_stream_join", "q_event_windows")
    val resMap = results.toMap
    val headJson = headline.flatMap(n => resMap.get(n).map(v =>
      "\"" + n + "\":" + (math.rint(v * 1000) / 1000))).mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n_queries":${results.size},"queries":$headJson,"errors":$errJson,$envJson,"full":"bench_latest.json","sf":"$sfDir"}"""
    println(compact)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/graft_bench.json"), fullLine)
    catch { case _: Throwable => }
    // the COMMITTED artifact only reflects full-catalog runs measured in a
    // HEALTHY host window — a filtered local-iteration run (args nonempty)
    // must not clobber it with a one-query JSON (found committed that way
    // in r11), and a degraded-window run (calib gate above) must not
    // become the canonical record either: retry when the window recovers.
    if (shouldBless(only.isEmpty, calibration))
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_latest.json"), fullLine)
      catch { case _: Throwable => }
    else if (only.isEmpty)
      System.err.println(f"[bench] unhealthy window (mean probe " +
        f"$calibShuffle%.3f vs ref $CalibShuffleRef; start " +
        f"$calibShuffleStart%.3f / end $calibShuffleEnd%.3f, " +
        f"agree=$calibAgree) - bench_latest.json NOT updated; " +
        "re-run in a healthier window")
    spark.stop()
  }
}

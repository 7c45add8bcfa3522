package graft.core

import org.apache.spark.sql.SparkSession

/** Catalog statistics wiring for Spark's cost-based optimizer (reference
  * optimizer/mod.rs:74-90: the planner seeds its cost model from store
  * statistics — row counts, NDVs — before join planning; the Spark-native
  * equivalent is external catalog tables + ANALYZE + `spark.sql.cbo.*`).
  *
  * AQE re-plans joins at runtime from materialized shuffle sizes; CBO stats
  * act EARLIER, at compile time, so a bad shuffle is never planned at all.
  * The concrete 100 TB win: a selectively-filtered fact side whose FILE
  * size is far over the broadcast threshold still broadcasts when column
  * stats shrink the post-filter cardinality estimate under it — a
  * sort-merge of two huge relations becomes a broadcast join with no
  * shuffle. Without stats, Catalyst carries the raw file size through
  * Filter nodes unchanged, and only AQE can rescue the plan after the
  * first shuffle has already run.
  */
object Stats {

  // db -> the config it was last analyzed with: a repeat call with the
  // SAME config skips the re-scan (ANALYZE costs full table reads; the
  // underlying parquet is immutable test data), a different config
  // re-registers and re-analyzes.
  private val analyzed = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Register the parquet tables under `dir` as EXTERNAL catalog tables in
    * database `db` (metadata only — the parquet stays in place) and run
    * ANALYZE over each: row count + size always, per-column min/max/NDV/
    * null-count when `columnStats` (unsupported column types are skipped
    * by FOR ALL COLUMNS). Re-running with identical arguments is a no-op
    * within the process; changed arguments refresh the registration.
    *
    * `events` is excluded by default: its TIMESTAMP(NANOS) column needs
    * the [[Tables]] legacy-nanos read path, which a catalog scan bypasses.
    */
  def analyze(spark: SparkSession, dir: String, db: String = "graft_stats",
      tables: Seq[String] = Tables.all.filterNot(_ == "events"),
      columnStats: Boolean = true): Unit = {
    // createTable resolves a RELATIVE path against the database's warehouse
    // location (not the process CWD), silently registering a table whose
    // files don't exist -- absolutize before registration.
    val absDir = new java.io.File(dir).getAbsolutePath
    val key = (absDir +: columnStats.toString +: tables).mkString("\u0001")
    if (analyzed.get(db).contains(key)) return
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      spark.catalog.createTable(s"$db.$t", s"$absDir/$t.parquet", "parquet")
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS" +
        (if (columnStats) " FOR ALL COLUMNS" else ""))
    }
    analyzed(db) = key
  }

  /** Run `body` with compile-time cost-based optimization enabled
    * (stats-backed selectivity estimation + join reorder), restoring the
    * prior conf values afterwards. Plans must be MATERIALIZED inside
    * `body` (collect/localCheckpoint) to be optimized under CBO — a lazy
    * DataFrame returned from here re-optimizes under whatever confs hold
    * at action time.
    */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prior = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

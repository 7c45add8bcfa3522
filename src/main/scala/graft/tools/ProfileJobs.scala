package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job/stage breakdown for ONE catalog query — answers "where do the
  * seconds go" when the bench number looks too big for the work (fixed
  * job-count overhead vs a genuinely expensive stage vs single-partition
  * serialization).
  *
  * Usage: runMain graft.tools.ProfileJobs <query>[,<query>...] [sfDir] [reps]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies session confs so
    // join-strategy/AQE candidates can be measured without a code edit
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).write.format("noop").mode("overwrite").save()
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

    // stageId -> (numTasks, totalTaskMs, maxTaskMs)
    val stages = mutable.LinkedHashMap.empty[Int, (Int, Long, Long)]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, Seq[Int])]
    // jobId -> short call site ("collect at CdcStreams.scala:231") so the
    // heavy rows are attributable without a UI
    val sites = mutable.LinkedHashMap.empty[Int, String]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val ms = t.taskInfo.duration
        val (n, tot, mx) = stages.getOrElse(t.stageId, (0, 0L, 0L))
        stages(t.stageId) = (n + 1, tot + ms, math.max(mx, ms))
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        jobs(j.jobId) = (j.time, 0L, j.stageIds.map(_.toInt))
        sites(j.jobId) = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(j.jobId).foreach { case (t0, _, s) =>
          jobs(j.jobId) = (t0, j.time - t0, s)
        }
      }
    }

    for (name <- names; fn = graft.SparkEntry.queries(name); r <- 1 to reps) {
      stages.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // drain listener bus before reading
      println(f"== rep $r: $name wall $wall%.2f s, ${jobs.size} jobs, ${stages.size} stages")
      val jobSum = jobs.values.map(_._2).sum / 1e3
      println(f"   sum(job wall) ${jobSum}%.2f s (gap to wall = driver/planning time)")
      jobs.foreach { case (id, (_, ms, sids)) =>
        val st = sids.flatMap(stages.get)
        val tasks = st.map(_._1).sum
        val taskMs = st.map(_._2).sum
        if (ms > 20)
          println(f"   job $id%3d ${ms / 1e3}%6.2f s  $tasks%4d tasks  taskTime ${taskMs / 1e3}%6.2f s  stages ${sids.mkString(",")}  ${sites.getOrElse(id, "")}")
      }
      val heavy = stages.toSeq.sortBy(-_._2._2).take(6)
      heavy.foreach { case (sid, (n, tot, mx)) =>
        if (tot > 20)
          println(f"   stage $sid%3d  $n%4d tasks  total ${tot / 1e3}%6.2f s  maxTask ${mx / 1e3}%5.2f s")
      }
    }
    spark.stop()
  }
}

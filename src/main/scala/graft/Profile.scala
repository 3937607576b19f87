package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: runs named queries under the
  * bench session config with a listener that attributes wall time to
  * Spark jobs (and, within jobs, to task execution), so driver-side
  * gaps — planning, codegen, collect-side model folds — show up as
  * the difference between query wall and Σ job wall, and scheduling
  * overhead as the difference between job wall and max task path.
  * Usage: Profile <sfDir> <reps> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // tiny-task shuffles: the bypass writer opens one file PER
      // REDUCE PARTITION per map task (32x32 file creations per
      // exchange here — measured as most of the fixed per-task cost
      // on sub-MB shuffles); below the threshold Spark uses the sort
      // writer, one data+index file per map task regardless of R. At
      // production R (thousands) bypass never engages anyway.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))

    case class JobRec(id: Int, start: Long, var end: Long = 0L,
        var nTasks: Int = 0, var taskTimeMs: Long = 0L,
        var desc: String = "")
    val jobs = new scala.collection.concurrent.TrieMap[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, e.time, desc = d)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        // attribute to the job owning this stage via active jobs
        jobs.values.toSeq.sortBy(-_.start).headOption.foreach { j =>
          j.nTasks += 1
          if (e.taskMetrics != null)
            j.taskTimeMs += e.taskMetrics.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup at sf0.001 (JIT) like Bench
      try fn(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      (1 to reps).foreach { rep =>
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val js = jobs.values.toSeq.sortBy(_.start)
        val jobWall = js.map(j => (j.end - j.start).max(0L)).sum / 1e3
        val taskSum = js.map(_.taskTimeMs).sum / 1e3
        println(f"== $name rep $rep: wall $wall%.3f s, " +
          f"sum(jobWall) $jobWall%.3f s, sum(taskTime) $taskSum%.3f s, " +
          f"jobs ${js.size}, gaps(driver) ${wall - jobWall}%.3f s")
        if (rep == reps) js.foreach { j =>
          val jw = (j.end - j.start).max(0L) / 1e3
          println(f"   job ${j.id}%3d wall $jw%7.3f s tasks ${j.nTasks}%4d " +
            f"taskTime ${j.taskTimeMs / 1e3}%7.3f s  ${j.desc.take(80)}")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only per-query profiler (optimization guide §1): for each named
  * query, split wall time into Catalyst planning (analyze+optimize+plan)
  * vs execution, and report job/stage/task counts plus summed executor
  * task time from a listener. Scheduling overhead ≈ exec wall −
  * taskTime/cores; a query with many stages and low task time is
  * latency-bound (stage barriers), one with high task time is
  * compute-bound. Usage:
  *   runMain graft.tools.Profile <sfDir> <q1> [q2 ...]   (reps fixed at 2;
  * the SECOND rep is reported — the first absorbs per-dataset landings,
  * matching the bench's min-of-2 convention.)
  */
object Profile {
  private class Acc extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    val stageRows = mutable.ArrayBuffer[(Int, Int, Long, String)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        // rddInfos name the operators whose RDDs live in this stage
        // (scope names like "WholeStageCodegen (3)", "Exchange") — the
        // only way to tell two 32-task stages apart with the UI off
        val ops = s.stageInfo.rddInfos.map(_.name).distinct.mkString("|")
        stageRows += ((s.stageInfo.stageId, s.stageInfo.numTasks,
          m.executorRunTime,
          f"cpu=${m.executorCpuTime / 1e9}%.2fs gc=${m.jvmGCTime / 1e3}%.2fs ops=$ops"))
      }
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; stageRows.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // warmup: flagship query end to end (the Bench convention)
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => }
    val out = mutable.ArrayBuffer[String]()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      var line = ""
      for (rep <- 1 to 2) {
        // reset BEFORE construction (r21): iterative operators flatten
        // via df.rdd, and on an AQE plan that materializes the internal
        // query stages EAGERLY — real jobs run during "planning". The
        // listener must see them or the plan_s/exec_s split misattributes
        // that work as pure Catalyst cost.
        acc.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val planJobs = acc.jobs
        val planTaskS = acc.taskTimeMs / 1e3
        val plan = df.queryExecution.executedPlan // force analysis+planning
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        val planS = (t1 - t0) / 1e9
        val execS = (t2 - t1) / 1e9
        line = f"""{"q":"$name","rep":$rep,"plan_s":$planS%.3f,""" +
          f""""exec_s":$execS%.3f,"jobs":${acc.jobs},"stages":${acc.stages},""" +
          f""""tasks":${acc.tasks},"task_time_s":${acc.taskTimeMs / 1e3}%.3f,""" +
          f""""plan_jobs":$planJobs,"plan_task_s":$planTaskS%.3f,""" +
          f""""shuf_rd_mb":${acc.shuffleReadB / 1e6}%.1f,""" +
          f""""shuf_wr_mb":${acc.shuffleWriteB / 1e6}%.1f}"""
        println(line)
        if (sys.env.contains("GRAFT_PROFILE_STAGES") && rep == 2)
          acc.stageRows.sortBy(-_._3).take(12).foreach { case (id, nt, ms, nm) =>
            println(f"  stage $id%4d tasks=$nt%4d task_time=${ms / 1e3}%7.2fs  $nm")
          }
      }
    }
    spark.stop()
  }
}

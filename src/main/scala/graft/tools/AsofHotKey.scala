package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEnv, Tables}

/** Dev-only HOT-KEY as-of measurement (r15 verdict ask #5): the skewed
  * regime [[graft.plans.AsofJoinExec]] exists for had no number.
  * Derives a hot-key layout from a scaled events table — `user_id`
  * folds mod `hotKeys`, so a handful of users carry ~ALL rows — and
  * runs the SAME as-of relation through both machineries:
  *
  *   - WINDOW form (q10's shape): union both event roles, one running
  *     `last(_, ignoreNulls)` window per user — state is the window
  *     operator's buffered frame machinery over the unioned stream;
  *   - EXEC form (q182's shape): AsofJoinExec — one co-partitioning
  *     exchange + sort per side, two-pointer merge, O(1) carried state.
  *
  * Both cluster on user_id, so both face the same few-partition skew;
  * the honest comparison is wall + peak per-task execution memory
  * (a TaskEnd listener tracks the max across the job). Results land in
  * BASELINE.md win or lose — the q173 cold-entry discipline.
  *
  * Usage: runMain graft.tools.AsofHotKey [dir] [hotKeys] */
object AsofHotKey {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scaled-x30")
    val hotKeys = if (args.length > 1) args(1).toInt else 4
    val spark = SparkEnv.local("asof-hotkey")
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val p = Option(t.taskMetrics).map(_.peakExecutionMemory).getOrElse(0L)
        peak.accumulateAndGet(p, math.max(_, _))
      }
    })
    try {
      val ev = Tables.events(spark, dir)
        .withColumn("user_id", pmod(col("user_id"), lit(hotKeys.toLong)))
      val evPath = graft.operators.Scratch.materializePath(ev, "asof-hot-ev")
      val hot = spark.read.parquet(evPath)

      def windowForm(): Long = {
        val clicks = hot.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
            lit(0).as("kind"), lit(-1L).as("eid"))
        val probes = hot.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            lit(null).cast("timestamp").as("click_ts"),
            lit(1).as("kind"), col("event_id").as("eid"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(probes)
          .withColumn("asof_ts",
            last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("eid").as("pid"), col("user_id"),
            coalesce(unix_millis(col("asof_ts")), lit(-1L)).as("asof_ms"))
          .count()
      }

      def execForm(): Long = {
        val probes = hot.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"), col("ts"))
        val clicks = hot.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        graft.plans.AsofJoin.asof(probes, clicks,
            keys = Seq("user_id" -> "c_user"),
            leftTimeCol = "ts", rightTimeCol = "c_ts")
          .select(col("pid"), col("user_id"),
            coalesce(unix_millis(col("c_ts")), lit(-1L)).as("asof_ms"))
          .count()
      }

      def measure(f: () => Long): (Double, Double, Long, Long) = {
        peak.set(0)
        val t0 = System.nanoTime(); val n1 = f()
        val cold = (System.nanoTime() - t0) / 1e9
        val p = peak.get()
        val t1 = System.nanoTime(); val n2 = f()
        val warm = (System.nanoTime() - t1) / 1e9
        require(n1 == n2, s"row drift across passes: $n1 vs $n2")
        (cold, math.min(cold, warm), n1, p)
      }

      val (wc, ww, wn, wp) = measure(() => windowForm())
      val (xc, xw, xn, xp) = measure(() => execForm())
      require(wn == xn, s"window/exec row mismatch: $wn vs $xn")
      graft.operators.Scratch.release(evPath)
      println(f"""{"metric":"asof_hotkey","dir":"$dir","hot_keys":$hotKeys,""" +
        f""""rows":$wn,"window":{"cold":$wc%.2f,"warm":$ww%.2f,""" +
        f""""peak_task_mem":$wp},"exec":{"cold":$xc%.2f,"warm":$xw%.2f,""" +
        f""""peak_task_mem":$xp}}""")
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall/cpu attribution for one or more SparkEntry queries
  * (test-scope A/B tool, the TimeQueries sibling): runs each named query
  * after an sf0.001 code warm-up and prints every stage's task count,
  * executor run/cpu time, shuffle bytes and spill, plus the first line of
  * the stage's callSite so the numbers map back to operators. Built for
  * the r21 optimization round: the bench's task-cpu channel is per-QUERY,
  * and attributing a 30-cpu-s query to its stages otherwise needs the UI
  * the bench keeps disabled.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageAgg(var tasks: Int = 0, var runMs: Long = 0L,
      var cpuNs: Long = 0L, var gcMs: Long = 0L, var shufReadB: Long = 0L,
      var shufWriteB: Long = 0L, var spillB: Long = 0L, var inRecs: Long = 0L,
      var outRecs: Long = 0L, var name: String = "", var submitted: Long = 0L,
      var completed: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, StageAgg]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        val a = stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg())
        a.name = e.stageInfo.name.linesIterator.next()
        a.submitted = System.currentTimeMillis()
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val a = stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg())
        a.completed = System.currentTimeMillis()
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = stages.getOrElseUpdate(te.stageId, StageAgg())
          a.tasks += 1
          a.runMs += m.executorRunTime
          a.cpuNs += m.executorCpuTime + m.executorDeserializeCpuTime
          a.gcMs += m.jvmGCTime
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          a.spillB += m.memoryBytesSpilled
          a.inRecs += m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
          a.outRecs += m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten
        }
      }
    })

    // code warm-up at the sibling sf0.001, untimed (the bench's protocol;
    // derived from the timed dir's parent like Bench does, so a non-default
    // SPARK_GRAFT_SF_DIR still warms instead of silently riding the 2–5×
    // JIT transient into round 1)
    val warm = new java.io.File(new java.io.File(dir).getParentFile, "sf0.001")
      .getAbsolutePath
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warm).queryExecution.toRdd.foreach(_ => ())
      catch { case e: Throwable => System.err.println(s"warm $n: $e") }
    }
    for (round <- 1 to sys.env.getOrElse("SPARK_GRAFT_PROFILE_ROUNDS", "2").toInt; n <- names) {
      spark.catalog.clearCache()
      org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext, 10000L)
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext, 10000L)
      println(f"===== $n round=$round wall=$wall%.2f cpu_total=${stages.valuesIterator.map(_.cpuNs).sum / 1e9}%.1f =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s ${"gc_s"}%5s ${"sh_rd_mb"}%8s ${"sh_wr_mb"}%8s ${"spill_mb"}%8s ${"in_rec"}%9s ${"out_rec"}%9s  site")
      stages.toSeq.sortBy(_._1).foreach { case (id, a) =>
        println(f"$id%6d ${a.tasks}%5d ${(a.completed - a.submitted) / 1e3}%7.2f ${a.runMs / 1e3}%7.2f ${a.cpuNs / 1e9}%7.2f ${a.gcMs / 1e3}%5.1f ${a.shufReadB / 1e6}%8.1f ${a.shufWriteB / 1e6}%8.1f ${a.spillB / 1e6}%8.1f ${a.inRecs}%9d ${a.outRecs}%9d  ${a.name.take(90)}")
      }
    }
    spark.stop()
  }
}

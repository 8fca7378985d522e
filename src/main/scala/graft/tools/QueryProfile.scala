package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.core.Engine

/** Headless substitute for the Spark UI's stage table (optimization guide
  * §1.1/§7.1): run named battery queries through the bench's noop sink
  * under a listener that aggregates per-stage task metrics, and print one
  * line per stage — wall span, summed executor run/CPU time, input bytes,
  * shuffle read/write bytes, and spill — worst stages first. This is the
  * "where does the time actually go" view for a query:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.QueryProfile q199_training_export"`.
  *
  * Dev-only probe (never on a query path). Stage attempts aggregate under
  * one row; a query is run once un-timed is NOT done here — JIT warmup is
  * the caller's concern (run the probe twice and read the second table).
  */
object QueryProfile {
  private final class Agg {
    var name = ""
    var tasks = 0
    var runMs = 0L; var cpuNs = 0L; var gcMs = 0L
    var inputBytes = 0L; var shufReadB = 0L; var shufWriteB = 0L
    var memSpill = 0L; var diskSpill = 0L
    var fetchWaitMs = 0L; var writeMs = 0L
    var firstLaunch = Long.MaxValue; var lastFinish = 0L
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.LinkedHashMap.empty[Int, Agg]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val a = stages.getOrElseUpdate(e.stageId, new Agg)
        a.tasks += 1
        val m = e.taskMetrics
        if (m != null) {
          a.runMs += m.executorRunTime; a.cpuNs += m.executorCpuTime
          a.gcMs += m.jvmGCTime
          a.inputBytes += m.inputMetrics.bytesRead
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          a.memSpill += m.memoryBytesSpilled; a.diskSpill += m.diskBytesSpilled
          a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
          a.writeMs += m.shuffleWriteMetrics.writeTime / 1000000L
        }
        val ti = e.taskInfo
        if (ti != null) {
          a.firstLaunch = math.min(a.firstLaunch, ti.launchTime)
          a.lastFinish = math.max(a.lastFinish, ti.finishTime)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, new Agg)
            .name = e.stageInfo.name.takeWhile(_ != '\n').take(90)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(b: Long) = f"${b / 1048576.0}%8.1f"
    args.foreach { n =>
      stages.clear()
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      SparkEntryAccess.run(n, spark, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(500)
      println(s"===== $n  wall=${f"$wall%.2f"}s =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"span_s"}%7s ${"run_s"}%7s " +
        f"${"cpu_s"}%7s ${"gc_s"}%6s ${"in_MB"}%8s ${"shR_MB"}%8s " +
        f"${"shW_MB"}%8s ${"spill_MB"}%8s ${"fetch_s"}%7s  name")
      val rows = stages.toSeq.sortBy(-_._2.runMs)
      rows.foreach { case (id, a) =>
        val span = if (a.lastFinish > 0) (a.lastFinish - a.firstLaunch) / 1e3 else 0.0
        println(f"$id%6d ${a.tasks}%5d $span%7.2f ${a.runMs / 1e3}%7.2f " +
          f"${a.cpuNs / 1e9}%7.2f ${a.gcMs / 1e3}%6.2f ${mb(a.inputBytes)} " +
          f"${mb(a.shufReadB)} ${mb(a.shufWriteB)} " +
          f"${mb(a.memSpill + a.diskSpill)} ${a.fetchWaitMs / 1e3}%7.2f  ${a.name}")
      }
      val totRun = rows.map(_._2.runMs).sum / 1e3
      val totShW = rows.map(_._2.shufWriteB).sum
      println(f"TOTAL run=${totRun}%.2f s  shufWrite=${mb(totShW)} MB  " +
        f"stages=${rows.size}")
    }
    spark.stop()
  }
}

/** Indirection so the probe reuses the battery lambdas + noop-sink timing
  * convention without copying them.
  */
private object SparkEntryAccess {
  def run(name: String, spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
}

package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.core.Engine

/** Headless substitute for the Spark UI's SQL tab (optimization guide
  * §7.1-7.2): execute a named battery query through ITS OWN QueryExecution
  * (`toRdd.foreach`, so the AQE-final plan and its SQLMetrics belong to the
  * printed tree) and dump every physical operator with its non-zero metric
  * values — numOutputRows, aggregate/sort/codegen times, shuffle bytes,
  * broadcast sizes. This is how a hot operator is attributed without the
  * UI: [[QueryProfile]] says which STAGE burns the time, this says which
  * OPERATOR produced how many rows and where the operator-level time went.
  *
  * Dev-only probe, never on a query path. AQE's final plan is reached via
  * the public executedPlan on materialized query stages; the top-level
  * AdaptiveSparkPlanExec's current plan is read reflectively (it has no
  * public accessor), which is acceptable for a diagnostic tool.
  */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanMetrics <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-planmetrics")
    spark.sparkContext.setLogLevel("ERROR")
    // Eager sub-executions (Spill writes, checkpoint/count/isEmpty probes)
    // carry most of a pipeline query's cost but never appear in the
    // returned frame's plan — capture EVERY execution and print each with
    // its duration, most expensive first.
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, org.apache.spark.sql.execution.QueryExecution, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = seen.add((funcName, qe, durationNs))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    args.foreach { n =>
      seen.clear()
      spark.sparkContext.setJobDescription(n)
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener + metric accumulators drain async
      println(s"===== $n  tailWall=${f"$wall%.2f"}s =====")
      import scala.jdk.CollectionConverters._
      val subs = seen.asScala.toSeq.sortBy(-_._3)
      println(s"--- ${subs.size} captured executions (eager spills/probes)" +
        " + the tail below, by duration ---")
      subs.foreach { case (fn, sqe, ns) =>
        println(f"  ${ns / 1e9}%7.2f s  $fn")
      }
      subs.take(4).foreach { case (fn, sqe, ns) =>
        println(s"--- sub-execution [$fn ${f"${ns / 1e9}%.2f"}s] ---")
        walk(sqe.executedPlan, 1)
      }
      println("--- tail plan ---")
      walk(qe.executedPlan, 0)
    }
    spark.stop()
  }

  private def fmt(v: Long, name: String, metricType: String): String =
    // switch on the metric's declared type: nsTiming values are
    // nanoseconds and rendering them as ms misattributed hot operators
    // by 1e6x (round-20 advisor item)
    if (metricType == "nsTiming") f"${v / 1e6}%.1fms"
    else if (metricType == "timing") s"${v}ms"
    else if (metricType == "size" || name.contains("size") ||
      name.contains("bytes") || name.contains("Bytes")) {
      if (v >= 10485760) s"${v / 1048576}MB"
      else if (v >= 10240) s"${v / 1024}KB" else s"${v}B"
    } else if (name.contains("time") || name.contains("duration")) {
      s"${v}ms"
    } else v.toString

  private def interesting(name: String): Boolean =
    name == "numOutputRows" || name.contains("time") ||
      name.contains("duration") || name.contains("dataSize") ||
      name.contains("spill") || name.contains("peak") ||
      name.contains("bytes written") || name.contains("shuffle bytes")

  def walk(p: SparkPlan, depth: Int): Unit = {
    val ms = p.metrics.toSeq
      .filter { case (k, m) => m.value > 0 && interesting(k) }
      .sortBy(_._1)
      .map { case (k, m) => s"$k=${fmt(m.value, k, m.metricType)}" }
      .mkString(" ")
    println(("  " * depth) + p.nodeName + (if (ms.isEmpty) "" else s"  [$ms]"))
    p match {
      case a: AdaptiveSparkPlanExec =>
        current(a).foreach(walk(_, depth + 1))
      case q: QueryStageExec => walk(q.plan, depth + 1)
      case r: ReusedExchangeExec =>
        println(("  " * (depth + 1)) + s"(reuses ${r.child.nodeName})")
      case _ => p.children.foreach(walk(_, depth + 1))
    }
    p.subqueries.foreach { sq =>
      println(("  " * (depth + 1)) + "[subquery]")
      walk(sq, depth + 2)
    }
  }

  private def current(a: AdaptiveSparkPlanExec): Option[SparkPlan] =
    // no public accessor for the in-flight/final physical plan; fall back
    // through the known field names across Spark versions
    Seq("currentPhysicalPlan", "org$apache$spark$sql$execution$adaptive$" +
      "AdaptiveSparkPlanExec$$currentPhysicalPlan")
      .flatMap { f =>
        try {
          val fld = classOf[AdaptiveSparkPlanExec].getDeclaredField(f)
          fld.setAccessible(true)
          Some(fld.get(a).asInstanceOf[SparkPlan])
        } catch { case _: Throwable => None }
      }.headOption
}

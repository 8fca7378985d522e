package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.core.Engine

/** Dump `explainString(FormattedMode)` for the named battery queries (all
  * args) against SPARK_GRAFT_SF_DIR — the source for PLANS.md sections and
  * ad-hoc plan audits: `sbt "runMain graft.Plans q75_range_join"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Plans <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.local("graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}

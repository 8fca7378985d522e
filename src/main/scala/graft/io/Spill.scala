package graft.io

import org.apache.spark.sql.DataFrame

/** Session-temp parquet materialization: write a frame once, read the
  * columnar result back — the "intermediate table" alternative to
  * `.persist()` whose lifetime a lazy-plan API cannot manage (round-2
  * verdict: an unreleasable persist strands cached blocks for the session).
  * Directories are deleted by a JVM shutdown hook.
  *
  * The base directory comes from `spark.graft.spill.dir` when set — on a
  * real cluster it MUST point at storage every executor can reach
  * (HDFS/S3/...); a driver-local temp path would scatter partition files
  * across executors' local disks. The local-temp default is correct only
  * for `local[*]` sessions. Spilling executes the subplan EAGERLY —
  * materialization is the point.
  */
object Spill {

  def apply(df: DataFrame, prefix: String = "graft-spill-"): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption("spark.graft.spill.dir") match {
      case Some(base) =>
        val d = s"${base.stripSuffix("/")}/$prefix${java.util.UUID.randomUUID()}"
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true): Unit
        }))
        d
      case None =>
        val d = java.nio.file.Files.createTempDirectory(prefix)
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d.toFile)))
        d.toString
    }
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}

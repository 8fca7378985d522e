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

  // ONE shutdown hook draining a registry of cleanup closures — a hook per
  // spill would grow the JVM's hook set (and pin a Thread each) without
  // bound in a long-running streaming driver
  private val cleanups = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var c = cleanups.poll()
      while (c != null) { try c() catch { case _: Exception => }; c = cleanups.poll() }
    }))

  // plain ThreadLocal, NOT DynamicVariable: DynamicVariable is backed by
  // an InheritableThreadLocal, so a thread spawned inside a scoped body
  // (e.g. a streaming query's execution thread) would inherit the scope
  // and have its spills deleted at scope exit while still reading them —
  // and would mutate the owner's unsynchronized deque concurrently.
  // With a plain ThreadLocal, child-thread spills register only in the
  // global registry (exit-time cleanup), per the documented contract.
  private val scope = new ThreadLocal[java.util.ArrayDeque[() => Unit]]()

  private def onExit(cleanup: () => Unit): Unit = {
    hookInstalled
    cleanups.add(cleanup)
    val q = scope.get()
    if (q != null) q.add(cleanup): Unit
  }

  /** Release every spill directory created so far — callable from
    * long-running drivers between epochs once prior spilled frames are no
    * longer referenced (exit-time cleanup still covers the rest).
    *
    * OWNERSHIP: this drains the GLOBAL registry — it deletes every live
    * spill in the JVM, including frames other components are still
    * reading (e.g. a caller's Spill-persisted model table). Only call it
    * from a context that owns all spills — a per-query battery driver
    * (Bench/Verify). A long-running pipeline that must release its OWN
    * per-epoch temporaries without touching anyone else's uses [[scoped]].
    */
  def releaseAll(): Unit = {
    var c = cleanups.poll()
    while (c != null) { try c() catch { case _: Exception => }; c = cleanups.poll() }
  }

  /** Run `f` and release ONLY the spill directories registered during it
    * (on this thread) — the safe per-epoch cleanup for `foreachBatch`
    * bodies: a micro-batch's internal spills are deleted at batch end
    * while spills the CALLER created earlier (persisted model tables,
    * ratio frames) survive. Scope tracking is thread-local, matching the
    * synchronous single-thread execution of a foreachBatch body; spills
    * created by `f` on OTHER threads fall back to exit-time cleanup
    * rather than being deleted out from under a racing reader.
    */
  def scoped[T](f: => T): T = {
    val prev = scope.get()
    val q = new java.util.ArrayDeque[() => Unit]()
    scope.set(q)
    try f
    finally {
      if (prev == null) scope.remove() else scope.set(prev)
      q.forEach { c =>
        cleanups.remove(c) // exit hook / releaseAll must not double-run it
        try c() catch { case _: Exception => }
      }
    }
  }

  /** A registered local temp directory (deleted by the same shutdown hook /
    * [[releaseAll]]) for callers needing a scratch PATH rather than a
    * spilled frame — e.g. a battery query materializing a per-call state
    * table that must not accumulate across bench repeats.
    */
  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    onExit(() => deleteRecursively(d.toFile))
    d.toString
  }

  def apply(df: DataFrame, prefix: String = "graft-spill-"): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption("spark.graft.spill.dir") match {
      case Some(base) =>
        val d = s"${base.stripSuffix("/")}/$prefix${java.util.UUID.randomUUID()}"
        val hadoopConf = spark.sparkContext.hadoopConfiguration
        onExit(() => {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(hadoopConf).delete(p, true): Unit
        })
        d
      case None =>
        val d = java.nio.file.Files.createTempDirectory(prefix)
        onExit(() => deleteRecursively(d.toFile))
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

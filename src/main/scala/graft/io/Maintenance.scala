package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Mechanical single-maintainer fence for persisted index mutation
  * ([[graft.operators.LexicalIndex]] append/compact/maintain, the
  * [[graft.operators.Similarity]] ANN append/maintain family).
  *
  * The indexes' multi-table layouts (postings + stats, postings +
  * centroids) make concurrent mutators unsafe by construction — e.g. an
  * append landing while a compaction folds would be silently dropped by
  * the fold's swap. Round 11 documented that as a prose contract; this
  * replaces it with a lease FILE so an operator error fails LOUD instead
  * of silently losing data: every mutator of an EXISTING index
  * (LexicalIndex append/compact and each epoch of maintain; Similarity
  * appendIvf[Pq]Index and the whole decision+mutation of
  * maintainIvf[Pq]Index — the initial `write*` builds bootstrap the root
  * and are single-owner by construction) creates `_maintenance.lease`
  * under the index root with the atomic create-if-absent primitive
  * (HDFS/local `FileSystem.create(overwrite = false)`), runs, then
  * deletes it. A second mutator arriving mid-run throws
  * [[ConcurrentMaintenanceException]] naming the holder.
  *
  * Crash recovery: a maintainer that died mid-run leaves its lease
  * behind, and every later mutator fails loud until an operator verifies
  * the dead run and deletes the lease file — the deliberate trade (the
  * failure mode is visible and recoverable; a TTL that auto-expired
  * could revive the silent-drop race it exists to prevent). The lease
  * body records owner/operation/timestamp for that triage.
  *
  * Readers never take the lease: queries against a mid-maintenance index
  * see the pre-swap copy ([[Swap]] keeps the live directory in place
  * until its replacement is complete).
  */
object Maintenance {

  final class ConcurrentMaintenanceException(msg: String)
    extends IllegalStateException(msg)

  /** The lease file guarding `path` (an index root). */
  def leasePath(path: String): Path = new Path(path, "_maintenance.lease")

  /** Run `body` holding `path`'s maintenance lease; throws
    * [[ConcurrentMaintenanceException]] if another maintainer holds it.
    * The lease releases on BOTH success and failure of `body` — a failed
    * append/compact leaves diagnosable table state, not a stale lock;
    * only a JVM death mid-body leaves the lease for manual recovery.
    */
  def withLease[A](spark: SparkSession, path: String, op: String)(
      body: => A): A = {
    val lease = leasePath(path)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the index root must exist before a mutator can fence on it (write()
    // creates it); creating the lease would otherwise create the root and
    // mask a typo'd path
    require(fs.exists(new Path(path)),
      s"index root $path does not exist - refusing to create a lease " +
        "under a path no index was written to (typo'd path?)")
    val out =
      try fs.create(lease, false)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw held(lease, fs, e)
        case e: java.io.IOException if fs.exists(lease) =>
          // RawLocalFileSystem signals create-exists as a plain
          // IOException rather than the typed subclass
          throw held(lease, fs, e)
      }
    // once fs.create has succeeded we own the lease: any failure from here
    // on (header write included) must delete it, or later maintainers are
    // blocked until manual recovery
    try {
      try {
        out.write((s"op=$op pid=${ProcessHandle.current().pid()} " +
          s"at=${java.time.Instant.now()}\n").getBytes("UTF-8"))
      } finally out.close()
      body
    } finally fs.delete(lease, false)
  }

  private def held(lease: Path, fs: org.apache.hadoop.fs.FileSystem,
      cause: Throwable): ConcurrentMaintenanceException = {
    val holder =
      try {
        val in = fs.open(lease)
        try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      } catch { case _: java.io.IOException => "<unreadable>" }
    new ConcurrentMaintenanceException(
      s"another maintainer holds $lease ($holder) - concurrent index " +
        "mutation would silently drop data; wait for it, or if it " +
        "crashed, verify and delete the lease file to recover")
  }
}

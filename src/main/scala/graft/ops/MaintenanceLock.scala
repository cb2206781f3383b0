package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Best-effort single-writer guard for table maintenance (compaction,
  * vacuum, index refresh): an exclusive lock file + mtime lease.
  *
  * Plain parquet dirs have no transaction log, so concurrent maintenance
  * runs could corrupt each other (recovery cannot tell a crashed run from
  * a live one). The lock makes the second run FAIL FAST instead:
  * `fs.create(lock, overwrite = false)` is the create-exclusive
  * primitive (atomic on HDFS and local file systems; best-effort on
  * object stores without conditional puts — hence "guard", not
  * "guarantee"). A crashed holder's lock expires after `leaseMs` based
  * on the file's modification time, so an operator never has to clean up
  * by hand — the next run past the lease heals it.
  *
  * The lock file name starts with `_`, which every Spark/parquet listing
  * path in this codebase (and Spark's own InMemoryFileIndex) already
  * ignores as a non-data file.
  */
object MaintenanceLock {

  val LockName = "_graft_maintenance.lock"

  /** Default lease: long enough for a big compaction, short enough that
    * a crashed run doesn't wedge the table for a shift. */
  val DefaultLeaseMs: Long = 30L * 60 * 1000

  /** Run `body` holding the exclusive maintenance lock under `dir`.
    * Throws [[ConcurrentMaintenanceException]] when another live run
    * holds an unexpired lock. Always releases on exit (success or
    * failure); a crash leaves the lock to lease expiry. */
  def withLock[T](fs: FileSystem, dir: Path, leaseMs: Long = DefaultLeaseMs)(
      body: => T): T =
    withLockFile(fs, new Path(dir, LockName), leaseMs)(body)

  /** Sibling-file variant for operations that DELETE `dir` itself
    * (index create in overwrite mode, index delete): the lock lives
    * beside the directory as `_<name>.lock`, so it survives the
    * directory's removal and still excludes refresh (which takes the
    * same sibling lock). */
  def withSiblingLock[T](fs: FileSystem, dir: Path, leaseMs: Long = DefaultLeaseMs)(
      body: => T): T = {
    val parent = Option(dir.getParent).getOrElse(
      throw new IllegalArgumentException(s"cannot sibling-lock a root path: $dir"))
    fs.mkdirs(parent)
    withLockFile(fs, new Path(parent, "_" + dir.getName + ".lock"), leaseMs)(body)
  }

  private def withLockFile[T](fs: FileSystem, lock: Path, leaseMs: Long)(
      body: => T): T = {
    // expired lease → the holder is presumed dead; heal it
    val existing =
      try Some(fs.getFileStatus(lock))
      catch { case _: java.io.FileNotFoundException => None }
    existing.foreach { st =>
      if (System.currentTimeMillis() - st.getModificationTime > leaseMs) {
        fs.delete(lock, false)
      }
    }
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException =>
          throw new ConcurrentMaintenanceException(
            s"another maintenance run holds $lock (lease ${leaseMs / 1000}s; " +
              s"expired locks are healed automatically on the next attempt)", e)
      }
    try {
      val info = s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
        s"pid=${ProcessHandle.current().pid()} at=${System.currentTimeMillis()}"
      out.write(info.getBytes("UTF-8"))
    } finally out.close()
    try body
    finally fs.delete(lock, false)
  }
}

/** A second maintenance run was attempted while the first holds the
  * table's lock. */
class ConcurrentMaintenanceException(msg: String, cause: Throwable)
  extends IllegalStateException(msg, cause)

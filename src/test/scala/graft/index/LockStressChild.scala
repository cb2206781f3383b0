package graft.index

/** Child-JVM side of [[LockCrossProcessSpec]]: a SECOND process that
  * interacts with the maintenance lock of `indexDir` (args: mode,
  * indexDir).
  *
  *   - `hold`: take the sibling lock through the real
  *     [[graft.ops.MaintenanceLock]] code path, print `HELD`, and keep
  *     holding until stdin closes (then release normally and print
  *     `RELEASED`). A watchdog halts after 120 s so an orphaned child
  *     can never wedge the build.
  *   - `crash`: leave behind exactly the artifact a crashed holder
  *     leaves — the bare lock file, no release — with its mtime
  *     backdated 1 h so the lease is already expired; print `CRASHED`
  *     and halt without cleanup.
  *   - `crash-fresh`: same, but with a CURRENT mtime — a holder that
  *     just died, lease still live. */
object LockStressChild {
  def main(args: Array[String]): Unit = {
    val watchdog = new Thread(() => {
      Thread.sleep(120000); Runtime.getRuntime.halt(99)
    })
    watchdog.setDaemon(true)
    watchdog.start()

    val mode = args(0)
    val indexDir = new org.apache.hadoop.fs.Path(args(1))
    val fs = indexDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    def lockPath = new org.apache.hadoop.fs.Path(
      indexDir.getParent, "_" + indexDir.getName + ".lock")
    mode match {
      case "hold" =>
        graft.ops.MaintenanceLock.withSiblingLock(fs, indexDir) {
          println("HELD"); Console.out.flush()
          try scala.io.StdIn.readLine()
          catch { case _: Exception => () }
        }
        println("RELEASED"); Console.out.flush()
      case "crash" | "crash-fresh" =>
        fs.create(lockPath, false).close()
        if (mode == "crash")
          fs.setTimes(lockPath, System.currentTimeMillis() - 3600L * 1000, -1)
        println("CRASHED"); Console.out.flush()
        Runtime.getRuntime.halt(137) // no release, no shutdown hooks
      case other => sys.error(s"unknown mode $other")
    }
  }
}

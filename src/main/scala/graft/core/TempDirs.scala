package graft.core

/** JVM-lifetime scratch-dir registry. Gate queries and streaming specs
  * create per-invocation scratch dirs (LSH index copies, streaming
  * inputs, checkpoints) that must outlive the query but not the
  * process; registering them here defers deletion to ONE shutdown hook
  * instead of leaking a parquet dir per invocation (each gate run, plan
  * inspection, and spec used to accumulate dirs in /tmp). Local-FS only
  * by design — these are java.nio temp dirs, never index deployment
  * paths.
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(p => rm(new java.io.File(p)))))
    ()
  }
  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(): Unit
  }

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def deleteOnExit(path: String): String = { hook; dirs.add(path); path }
}

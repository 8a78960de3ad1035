package graft

/** Driver-local scratch directories for queries that persist an
  * intermediate store (q262/q263/q268, RunOne's ivf_serve probe).
  *
  * Two leaks this exists to close (ADVICE r12): a fresh
  * `Files.createTempDirectory` per invocation accumulates one
  * corpus-sized parquet tree per verify/bench iteration, unbounded
  * under /tmp; and nothing ever deleted them. Here each NAMED scratch
  * is a fixed location wiped and recreated on every call — repeated
  * runs reuse the same footprint instead of growing it — and one JVM
  * shutdown hook removes the whole scratch root.
  *
  * `java.io.File` is correct at THIS layer (unlike the store
  * maintenance paths): scratch is driver-local temp space by
  * definition, never HDFS/object-store state. */
object Scratch {
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def base = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft-scratch")

  /** A fresh (emptied) scratch directory at a stable per-name path. */
  def dir(name: String): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(base)))
    val d = new java.io.File(base, name)
    delete(d)
    d.mkdirs()
    d.toString
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}

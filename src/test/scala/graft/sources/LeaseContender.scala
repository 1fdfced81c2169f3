package graft.sources

/** Child-process entry point for LeaseCrossProcessSpec: a real second JVM
  * contending for the same artifact's writer lease over the shared
  * filesystem — the in-process drills (VersionedSpec) stage interleavings
  * deterministically, but the protocol's cross-process claims (OS-scoped
  * lock release on crash, takeover arbitration between PROCESSES, active
  * holder exclusion) need real process boundaries. No SparkSession — the
  * lease layer is pure JVM, so children start in milliseconds.
  *
  * Modes (first arg; `path` second):
  *   - `hold <ms>`:   acquire, print HELD, sleep, release, print RELEASED.
  *   - `contendhold <ms>`: try acquire; print ACQUIRED (then hold + clean
  *     release) or REFUSED. The takeover-race drill counts these.
  *   - `crash <ttlMs>`: acquire with the given ttl, print CRASHED, then
  *     `halt` — no release, no shutdown hooks, heartbeat dies with the
  *     process. The lease CONTENT must keep excluding contenders until
  *     its stamped expiry, then be taken over.
  */
object LeaseContender {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val path = args(1)
    mode match {
      case "hold" =>
        Versioned.withWriterLease(path) {
          println("HELD"); System.out.flush()
          Thread.sleep(args(2).toLong)
        }
        println("RELEASED")
      case "contendhold" =>
        try Versioned.withWriterLease(path) {
          println("ACQUIRED"); System.out.flush()
          Thread.sleep(args(2).toLong)
        }
        catch { case _: Versioned.ConcurrentWriterException => println("REFUSED") }
      case "crash" =>
        val canonical = new java.io.File(path).getCanonicalPath
        Versioned.acquireFileLease(canonical, args(2).toLong)
        println("CRASHED"); System.out.flush()
        Runtime.getRuntime.halt(42)
    }
  }
}

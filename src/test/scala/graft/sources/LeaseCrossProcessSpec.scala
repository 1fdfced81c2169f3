package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The writer-lease protocol's cross-PROCESS claims, drilled with real
  * second JVMs (LeaseContender children over ProcessBuilder — no Spark in
  * the children, so each starts in well under a second):
  *
  *   1. an ACTIVE holder in another process excludes this one, loudly;
  *   2. a holder that dies without releasing (halt — no shutdown hooks,
  *      heartbeat gone) keeps excluding contenders until its lease
  *      expiry, then is taken over — the OS releases the `.LOCK` file
  *      lock instantly on death, and the protocol must still arbitrate
  *      on the lease CONTENT, not the lock;
  *   3. N processes racing an expired lease produce exactly ONE holder
  *      (takeover arbitration across process boundaries), and the
  *      winner's clean release leaves nothing behind.
  *
  * In-process interleavings (stalled renewals, successor clobber, torn
  * content) live in VersionedSpec; this spec is only about what a real
  * process boundary changes.
  */
class LeaseCrossProcessSpec extends AnyFunSuite {

  private def mkArtifact(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_xproc").toString
    val d = new java.io.File(s"$root/art"); d.mkdirs()
    d.getCanonicalPath
  }

  /** Spawn a LeaseContender child JVM; returns the Process (stdout
    * merged with stderr, line-buffered).
    */
  private def spawn(args: String*): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    new ProcessBuilder(
      (Seq(java, "-cp", cp, "graft.sources.LeaseContender") ++ args): _*)
      .redirectErrorStream(true).start()
  }

  /** Block until the child prints `marker` (its flushed progress line).
    * A watchdog kills the child at the deadline so a silent hung child
    * surfaces as EOF + a loud assert instead of a readLine that blocks
    * the suite forever.
    */
  private def awaitLine(p: Process, marker: String, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    // armed ONLY while we wait for the marker, and disarmed the moment it
    // arrives — a watchdog that outlives the wait would force-kill a
    // child a later assertion still depends on being alive
    val watchdog = new Thread(() => {
      try {
        if (!p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
          p.destroyForcibly()
      } catch { case _: InterruptedException => () } // disarmed
      ()
    })
    watchdog.setDaemon(true); watchdog.start()
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = r.readLine()
      while (line != null && !line.contains(marker)) {
        assert(System.currentTimeMillis() < deadline, s"no '$marker' within ${timeoutMs}ms")
        line = r.readLine()
      }
      assert(line != null, s"child exited (or was killed at the ${timeoutMs}ms deadline) before printing '$marker'")
    } finally watchdog.interrupt()
  }

  private def drainOutput(p: Process): String = {
    p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
    new String(p.getInputStream.readAllBytes(), "UTF-8")
  }

  test("an active holder in another process excludes this one, loudly") {
    val art = mkArtifact()
    val child = spawn("hold", art, "8000")
    try {
      awaitLine(child, "HELD")
      val e = intercept[Versioned.ConcurrentWriterException] {
        Versioned.withWriterLease(art) { fail("body must not run") }
      }
      assert(e.getMessage.contains("active writer lease"))
    } finally { child.destroyForcibly(); child.waitFor() }
    // once the holder is gone and its lease expires or is released, the
    // parent acquires normally (destroyForcibly skipped the release, so
    // this also exercises expiry takeover with the default short path)
    val leaseFile = new java.io.File(art + ".WRITER.LEASE")
    // force expiry rather than waiting out a healthy TTL
    if (leaseFile.exists()) {
      val content = java.nio.file.Files.readString(leaseFile.toPath).trim
      val id = content.split(" ")(0)
      java.nio.file.Files.writeString(leaseFile.toPath,
        s"$id ${System.currentTimeMillis() - 1000}")
    }
    var ran = false
    Versioned.withWriterLease(art) { ran = true }
    assert(ran)
  }

  test("a crashed holder (halt, no release) excludes until lease expiry, then is taken over") {
    val art = mkArtifact()
    val ttlMs = 8000L
    val child = spawn("crash", art, ttlMs.toString)
    awaitLine(child, "CRASHED")
    child.waitFor()
    // process is DEAD (OS lock released) but the lease content is live:
    // contenders must still be excluded — arbitration is content, not lock.
    // The exclusion assert is timing-guarded against a pathologically slow
    // host: it only runs while the child's STAMPED expiry is comfortably
    // in the future (the stamp is ground truth for what the protocol must
    // enforce; asserting exclusion after it passed would be asserting a
    // lie). The takeover half below is unconditional.
    val stamped = java.nio.file.Files
      .readString(java.nio.file.Paths.get(art + ".WRITER.LEASE"))
      .trim.split(" ")(1).toLong
    if (System.currentTimeMillis() < stamped - 1000) {
      intercept[Versioned.ConcurrentWriterException] {
        Versioned.withWriterLease(art) { fail("unexpired crashed lease must exclude") }
      }
    }
    // after expiry the takeover path must succeed without manual cleanup
    val deadline = System.currentTimeMillis() + ttlMs + 30000
    var ran = false
    while (!ran && System.currentTimeMillis() < deadline) {
      try Versioned.withWriterLease(art) { ran = true }
      catch { case _: Versioned.ConcurrentWriterException => Thread.sleep(250) }
    }
    assert(ran, "crashed holder's expired lease was never taken over")
  }

  test("processes racing an expired lease: exactly one holder; clean release leaves nothing") {
    val art = mkArtifact()
    // seed a dead writer's expired lease
    assert(PosixLeaseBackend.createIfAbsent(art + ".WRITER.LEASE",
      s"deadhost:1 ${System.currentTimeMillis() - 60000}"))
    // 4 child JVMs contend; the winner holds LONGER than worst-case
    // sibling startup skew, so losers always meet an ACTIVE lease
    val children = (1 to 4).map(_ => spawn("contendhold", art, "12000"))
    val outputs = children.map(drainOutput)
    val acquired = outputs.count(_.contains("ACQUIRED"))
    val refused = outputs.count(_.contains("REFUSED"))
    assert(acquired == 1, s"expected exactly one cross-process winner, got $acquired\n${outputs.mkString("---\n")}")
    assert(refused == 3, s"expected 3 refusals, got $refused")
    // the winner's clean release removed its own lease
    assert(!new java.io.File(art + ".WRITER.LEASE").exists())
    // and the artifact is acquirable again
    var ran = false
    Versioned.withWriterLease(art) { ran = true }
    assert(ran)
  }
}

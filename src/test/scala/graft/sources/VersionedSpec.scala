package graft.sources

import graft.SparkTestBase

/** Unit-level contract of the pointer-file publication protocol — the
  * store-level specs (ArtifactStoresSpec) exercise it end-to-end; these
  * localize a failure to the protocol itself.
  */
class VersionedSpec extends SparkTestBase {

  private def mkRoot() =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString

  test("publish resolves via the pointer with the recorded watermark") {
    import spark.implicits._
    val root = mkRoot()
    Versioned.publish(root, "t", 42L) { dir =>
      Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(dir)
    }
    val cur = Versioned.readPointer(root, "t").get
    assert(cur.watermark == 42L)
    assert(cur.dir.startsWith("t-v1-"))
    assert(Versioned.read(spark, root, "t").count() == 2)
  }

  test("republish bumps the version, keeps the previous one, GCs older") {
    import spark.implicits._
    val root = mkRoot()
    def pub(n: Int): Unit = Versioned.publish(root, "t", n.toLong) { dir =>
      Seq.fill(n)(n).toDF("v").write.parquet(dir)
    }
    pub(1); val v1 = Versioned.readPointer(root, "t").get.dir
    pub(2); val v2 = Versioned.readPointer(root, "t").get.dir
    // previous version survives the flip (for in-flight readers)
    assert(new java.io.File(s"$root/$v1").exists())
    assert(v2.startsWith("t-v2-") && Versioned.readPointer(root, "t").get.watermark == 2L)
    pub(3)
    val v3 = Versioned.readPointer(root, "t").get.dir
    assert(v3.startsWith("t-v3-"))
    // v2 (immediately previous) kept, v1 garbage-collected
    assert(new java.io.File(s"$root/$v2").exists())
    assert(!new java.io.File(s"$root/$v1").exists())
    assert(Versioned.read(spark, root, "t").count() == 3)
  }

  test("read without a published version fails loudly") {
    val root = mkRoot()
    val e = intercept[IllegalStateException] {
      Versioned.read(spark, root, "missing")
    }
    assert(e.getMessage.contains("no published version"))
  }

  test("a reader loop concurrent with a publisher loop never sees a missing or partial table") {
    import spark.implicits._
    val root = mkRoot()
    // seed version, then a publisher thread rolls 15 more versions while
    // the main thread reads continuously. The contract: a single
    // resolve-and-consume read spanning at most ONE publish always sees a
    // complete version; a reader that stalls across TWO rapid publishes
    // can lose its GC'd version mid-read and must RE-RESOLVE — so each
    // read here retries once, and the assertion is that a fresh resolve
    // always succeeds (two consecutive failures would mean a genuinely
    // missing/partial table, the delete-then-rename bug this protocol
    // replaced). Production republish cadence is minutes-to-hours, so the
    // retry path exists for exactly this stress shape.
    Versioned.publish(root, "t", 1L)(d => Seq.fill(10)(1).toDF("v").write.parquet(d))
    val publisherError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val publisher = new Thread(() => {
      try {
        for (n <- 2 to 16)
          Versioned.publish(root, "t", n.toLong)(d =>
            Seq.fill(10 * n)(n).toDF("v").write.parquet(d))
      } catch { case t: Throwable => publisherError.set(t) }
    })
    def readOnceOrRetry(): Long =
      try Versioned.read(spark, root, "t").count()
      catch { case _: org.apache.spark.SparkException =>
        Versioned.read(spark, root, "t").count() // fresh resolve must succeed
      }
    publisher.start()
    try {
      var reads = 0
      while (publisher.isAlive && reads < 1000) {
        val c = readOnceOrRetry()
        assert(c % 10 == 0 && c >= 10 && c <= 160,
          s"read $c rows — not a complete published version")
        reads += 1
      }
      assert(reads > 0)
    } finally publisher.join()
    assert(publisherError.get() == null, s"publisher failed: ${publisherError.get()}")
    assert(readOnceOrRetry() == 160)
    assert(Versioned.readPointer(root, "t").get.watermark == 16L)
  }

  // ------------------------------------------------------------------
  // Lease protocol drills THROUGH the LeaseBackend interface: the same
  // acquire/renew/release logic every store runs, driven against (a) the
  // default POSIX backend's CAS primitives and (b) an in-memory backend
  // where adversarial interleavings can be staged deterministically.
  // ------------------------------------------------------------------

  /** Linearizable in-memory backend — the reference implementation of the
    * LeaseBackend contract (what an object-store conditional-put gives).
    */
  private final class InMemoryLeaseBackend extends LeaseBackend {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]
    def read(path: String): Option[String] = Option(m.get(path)).map(_._1)
    def ageMs(path: String): Option[Long] =
      Option(m.get(path)).map(v => System.currentTimeMillis() - v._2)
    def createIfAbsent(path: String, content: String): Boolean =
      m.putIfAbsent(path, (content, System.currentTimeMillis())) == null
    def replaceIfContent(path: String, expected: String, next: String): Boolean = {
      while (true) {
        val cur = m.get(path)
        if (cur == null || cur._1 != expected) return false
        if (m.replace(path, cur, (next, System.currentTimeMillis()))) return true
      }
      false
    }
    def deleteIfContent(path: String, expected: String): Boolean = {
      while (true) {
        val cur = m.get(path)
        if (cur == null || cur._1 != expected) return false
        if (m.remove(path, cur)) return true
      }
      false
    }
  }

  private def withBackend[T](be: LeaseBackend)(body: => T): T = {
    val prev = Versioned.leaseBackend
    Versioned.leaseBackend = be
    try body finally Versioned.leaseBackend = prev
  }

  test("PosixLeaseBackend: primitives are content-conditional (CAS)") {
    val p = s"${mkRoot()}/a.WRITER.LEASE"
    val be = PosixLeaseBackend
    assert(be.read(p).isEmpty && be.ageMs(p).isEmpty)
    assert(be.createIfAbsent(p, "me 1"))
    assert(!be.createIfAbsent(p, "you 2"), "create must lose against an existing lease")
    assert(be.read(p).contains("me 1"))
    assert(be.ageMs(p).exists(a => a >= 0 && a < 60000))
    assert(!be.replaceIfContent(p, "stale", "x"), "CAS with wrong expected must fail")
    assert(be.read(p).contains("me 1"))
    assert(be.replaceIfContent(p, "me 1", "me 2"))
    assert(!be.deleteIfContent(p, "me 1"), "delete with wrong expected must fail")
    assert(be.read(p).contains("me 2"))
    assert(be.deleteIfContent(p, "me 2"))
    assert(be.read(p).isEmpty)
  }

  test("lease protocol: a stalled holder's renewal/release can never clobber a successor") {
    val be = new InMemoryLeaseBackend
    withBackend(be) {
      val canonical = "/mem/artifact"
      val path = canonical + ".WRITER.LEASE"
      // holder acquires with an immediately-expiring lease, then stalls
      val mine = Versioned.acquireFileLease(canonical, ttlMs = 1)
      Thread.sleep(5)
      // a foreign contender takes over the expired lease (its own CAS)
      val successor = s"otherhost:4242 ${System.currentTimeMillis() + 600000}"
      assert(be.replaceIfContent(path, mine, successor))
      // the stalled holder's heartbeat fires late: must observe LOST, not
      // overwrite — this is the read-compare-then-move TOCTOU, closed
      val owned = new java.util.concurrent.atomic.AtomicReference[String](mine)
      Versioned.renewLease(canonical, 60000, owned)
      assert(owned.get() == null, "stalled holder must mark the lease lost")
      assert(be.read(path).contains(successor), "successor's lease must be untouched")
      // and its release path must not delete the successor's lease either
      Versioned.releaseFileLease(canonical, mine)
      assert(be.read(path).contains(successor))
      // a healthy renewal (content still ours) DOES advance the expiry
      assert(be.replaceIfContent(path, successor, mine)) // hand it back
      val owned2 = new java.util.concurrent.atomic.AtomicReference[String](mine)
      Versioned.renewLease(canonical, 60000, owned2)
      assert(owned2.get() != null && owned2.get() != mine)
      assert(be.read(path).contains(owned2.get()))
    }
  }

  test("lease takeover arbitration: distinct contenders racing the CAS — exactly one winner") {
    // the protocol's takeover step is ONE replaceIfContent(expiredContent,
    // mine): exclusivity reduces to the backend CAS, drilled here with 8
    // distinct foreign identities against BOTH backends
    def drill(be: LeaseBackend, path: String): Unit = {
      val dead = s"deadhost:1 ${System.currentTimeMillis() - 1000}"
      assert(be.createIfAbsent(path, dead))
      val winners = new java.util.concurrent.atomic.AtomicInteger
      val threads = (1 to 8).map(i => new Thread(() => {
        if (be.replaceIfContent(path, dead,
            s"host$i:$i ${System.currentTimeMillis() + 600000}"))
          winners.incrementAndGet()
        ()
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(winners.get() == 1,
        s"takeover must be exclusive, got ${winners.get()} winners")
      // and the surviving lease is the winner's, intact
      assert(be.read(path).exists(_.startsWith("host")))
    }
    drill(new InMemoryLeaseBackend, "/mem/artifact2.WRITER.LEASE")
    drill(PosixLeaseBackend, s"${mkRoot()}/art2.WRITER.LEASE")
  }

  test("lease protocol: negative torn-lease age (clock skew) is judged ACTIVE") {
    val root = mkRoot()
    val dir = s"$root/art"
    new java.io.File(dir).mkdirs()
    val lease = new java.io.File(new java.io.File(dir).getCanonicalPath + ".WRITER.LEASE")
    // unparseable (torn) content with mtime in the FUTURE — another host's
    // clock runs ahead; must be treated as an active writer, not garbage
    java.nio.file.Files.writeString(lease.toPath, "torn-garbage-no-expiry")
    java.nio.file.Files.setLastModifiedTime(lease.toPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 120000))
    intercept[Versioned.ConcurrentWriterException] {
      Versioned.withWriterLease(dir) { fail("body must not run under a skewed-clock torn lease") }
    }
    // the same torn content AGED past the TTL is genuine crash garbage → takeover
    java.nio.file.Files.setLastModifiedTime(lease.toPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 600000))
    var ran = false
    Versioned.withWriterLease(dir, ttlMs = 300000) { ran = true }
    assert(ran && !lease.exists())
  }

  test("independent names version independently") {
    import spark.implicits._
    val root = mkRoot()
    Versioned.publish(root, "a", 1L)(d => Seq(1).toDF("v").write.parquet(d))
    Versioned.publish(root, "b", 9L)(d => Seq(1, 2).toDF("v").write.parquet(d))
    Versioned.publish(root, "a", 2L)(d => Seq(1, 2, 3).toDF("v").write.parquet(d))
    assert(Versioned.readPointer(root, "a").get.watermark == 2L)
    assert(Versioned.readPointer(root, "b").get.watermark == 9L)
    assert(Versioned.read(spark, root, "a").count() == 3)
    assert(Versioned.read(spark, root, "b").count() == 2)
  }
}

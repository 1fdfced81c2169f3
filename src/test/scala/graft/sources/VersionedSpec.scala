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
  // acquire/renew/takeover/release logic every store runs, driven against
  // BOTH shipped backends — the POSIX file-lock CAS and the in-memory
  // ETag-simulating object-store reference (InMemoryCasLeaseBackend) — so
  // a protocol step that silently assumes POSIX semantics fails this
  // matrix, not a production object-store deployment.
  // ------------------------------------------------------------------

  private def withBackend[T](be: LeaseBackend)(body: => T): T = {
    val prev = Versioned.leaseBackend
    Versioned.leaseBackend = be
    try body finally Versioned.leaseBackend = prev
  }

  /** One drill environment per backend: fresh backend instance, fresh
    * canonical artifact path, and an mtime override for staging the
    * age-judgment scenarios. The in-memory paths are URI-shaped so
    * withWriterLease takes the no-java.io canonicalization branch — the
    * same one a real object-store path takes.
    */
  private case class LeaseEnv(name: String, mkBackend: () => LeaseBackend,
                              mkArtifact: () => String,
                              setMtime: (LeaseBackend, String, Long) => Unit)

  private val leaseEnvs: Seq[LeaseEnv] = Seq(
    LeaseEnv("posix", () => PosixLeaseBackend,
      () => {
        val d = new java.io.File(s"${mkRoot()}/art"); d.mkdirs(); d.getCanonicalPath
      },
      (_, path, t) => java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(path),
        java.nio.file.attribute.FileTime.fromMillis(t))),
    LeaseEnv("inmem-etag", () => new InMemoryCasLeaseBackend,
      () => s"mem://drill/${java.util.UUID.randomUUID()}/art",
      (be, path, t) => be.asInstanceOf[InMemoryCasLeaseBackend].setMtime(path, t)))

  private def leaseFileOf(canonical: String) = canonical + ".WRITER.LEASE"

  for (env <- leaseEnvs) {

    test(s"[${env.name}] backend primitives are content-conditional (CAS)") {
      val be = env.mkBackend()
      val p = leaseFileOf(env.mkArtifact())
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

    test(s"[${env.name}] a stalled holder's renewal/release can never clobber a successor") {
      val be = env.mkBackend()
      withBackend(be) {
        val canonical = env.mkArtifact()
        val path = leaseFileOf(canonical)
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

    test(s"[${env.name}] takeover arbitration: distinct contenders racing the CAS — exactly one winner") {
      // the protocol's takeover step is ONE replaceIfContent(expiredContent,
      // mine): exclusivity reduces to the backend CAS, drilled with 8
      // distinct foreign identities
      val be = env.mkBackend()
      val path = leaseFileOf(env.mkArtifact())
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

    test(s"[${env.name}] acquire refuses an active foreign lease, takes over an expired one, release leaves nothing") {
      val be = env.mkBackend()
      withBackend(be) {
        val canonical = env.mkArtifact()
        val path = leaseFileOf(canonical)
        // active foreign lease → loud refusal, lease untouched
        val foreign = s"otherhost:7 ${System.currentTimeMillis() + 600000}"
        assert(be.createIfAbsent(path, foreign))
        intercept[Versioned.ConcurrentWriterException] {
          Versioned.withWriterLease(canonical) { fail("body must not run") }
        }
        assert(be.read(path).contains(foreign))
        // expire it → full acquire/body/release cycle succeeds and the
        // release removes OUR lease (expiry-released, nothing leaks)
        assert(be.replaceIfContent(path, foreign,
          s"otherhost:7 ${System.currentTimeMillis() - 1000}"))
        var ran = false
        Versioned.withWriterLease(canonical) { ran = true }
        assert(ran)
        assert(be.read(path).isEmpty, "release must remove our own lease")
      }
    }

    test(s"[${env.name}] torn-lease age judgment: future mtime (clock skew) is ACTIVE, aged garbage is takeover") {
      val be = env.mkBackend()
      withBackend(be) {
        val canonical = env.mkArtifact()
        val path = leaseFileOf(canonical)
        // unparseable (torn) content with mtime in the FUTURE — another
        // host's clock runs ahead; must be treated as an active writer
        assert(be.createIfAbsent(path, "torn-garbage-no-expiry"))
        env.setMtime(be, path, System.currentTimeMillis() + 120000)
        intercept[Versioned.ConcurrentWriterException] {
          Versioned.withWriterLease(canonical) {
            fail("body must not run under a skewed-clock torn lease")
          }
        }
        // the same torn content AGED past the TTL is crash garbage → takeover
        env.setMtime(be, path, System.currentTimeMillis() - 600000)
        var ran = false
        Versioned.withWriterLease(canonical, ttlMs = 300000) { ran = true }
        assert(ran && be.read(path).isEmpty)
      }
    }
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

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

package graft.sources

import graft.SparkTestBase

/** Conformance matrix for the artifact metadata plane ([[MetaBackend]]):
  * every primitive drilled over ALL THREE shipped storage classes —
  * POSIX, Hadoop FileSystem, and the native object store (single-PUT, no
  * rename) — plus the full Versioned pointer lifecycle (publish /
  * re-publish / GC / reader resolve) and the RowCountCache freshness
  * fingerprint run with each non-default backend installed, so the
  * pointer protocol is proven against the interface, not against POSIX
  * behavior it happened to inherit. The object-store rows run the data
  * plane through [[MemFileSystem]] (`mem://`) over the SAME bucket the
  * meta backend writes — one namespace, like a real `s3a://` deployment.
  */
class MetaBackendSpec extends SparkTestBase {

  private def mkLocalRoot() =
    java.nio.file.Files.createTempDirectory("graft_meta").toString

  private val memSeq = new java.util.concurrent.atomic.AtomicInteger()
  private def mkMemRoot() = s"mem://graftspec/r${memSeq.incrementAndGet()}"

  /** (name, backend, mkRoot, rawPut, rawMkdir) — rawPut/rawMkdir create
    * test fixtures OUTSIDE the backend under test, through the storage
    * class's own native API (nio for the file-backed pair, bucket PUT for
    * the object store).
    */
  private def backends: Seq[(String, () => MetaBackend, () => String,
      (String, String) => Unit, String => Unit)] = {
    def nioPut(path: String, content: String): Unit = {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content)
      ()
    }
    def nioMkdir(path: String): Unit = { new java.io.File(path).mkdirs(); () }
    def memPut(path: String, content: String): Unit = {
      val (b, k) = MemObjectStore.parse(path)
      b.put(k, content.getBytes("UTF-8"))
    }
    def memMkdir(path: String): Unit = {
      val (b, k) = MemObjectStore.parse(path)
      b.mkdir(k)
    }
    Seq(
      ("posix", () => PosixMetaBackend, mkLocalRoot _, nioPut _, nioMkdir _),
      ("hadoop", () => new HadoopMetaBackend(
        spark.sparkContext.hadoopConfiguration), mkLocalRoot _, nioPut _, nioMkdir _),
      ("objectstore", () => ObjectStoreMetaBackend, mkMemRoot _, memPut _, memMkdir _))
  }

  for ((name, mkBe, mkRoot, rawPut, rawMkdir) <- backends) {

    test(s"[$name] readString/writeAtomic: whole-object publish, absent reads None") {
      val be = mkBe()
      val p = s"${mkRoot()}/t.CURRENT"
      assert(be.readString(p).isEmpty)
      be.writeAtomic(p, "dir-v1 42")
      assert(be.readString(p).contains("dir-v1 42"))
      be.writeAtomic(p, "dir-v2 43") // overwrite is part of the contract
      assert(be.readString(p).contains("dir-v2 43"))
    }

    test(s"[$name] concurrent readers of a hot pointer never see torn content") {
      val be = mkBe()
      val p = s"${mkRoot()}/t.CURRENT"
      be.writeAtomic(p, "a " * 499 + "a") // 500 tokens, one distinct shape
      val bad = new java.util.concurrent.atomic.AtomicReference[String]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) be.readString(p).foreach { c =>
          if (!(c == "a " * 499 + "a" || c == "b " * 499 + "b")) bad.set(c)
        }
      })
      reader.start()
      for (i <- 1 to 50)
        be.writeAtomic(p, (if (i % 2 == 0) "a " * 499 + "a" else "b " * 499 + "b"))
      stop.set(true); reader.join()
      assert(bad.get() == null, s"torn read observed: ${bad.get()}")
    }

    test(s"[$name] createMarker is idempotent; exists tracks it") {
      val be = mkBe()
      val root = mkRoot()
      val m = s"$root/_SUCCESS"
      assert(!be.exists(m))
      be.createMarker(m)
      assert(be.exists(m))
      be.createMarker(m) // second completer of the same build: success
      assert(be.exists(m))
    }

    test(s"[$name] list returns children with sizes and dir flags; absent dir lists empty") {
      val be = mkBe()
      val root = mkRoot()
      rawMkdir(root)
      assert(be.list(s"$root/missing").isEmpty)
      rawPut(s"$root/part-00000", "12345")
      rawMkdir(s"$root/sub")
      val entries = be.list(root).sortBy(_.name)
      assert(entries.map(_.name) == Seq("part-00000", "sub"))
      assert(entries.head.size == 5 && !entries.head.isDir)
      assert(entries(1).isDir)
    }

    test(s"[$name] deleteRecursively removes a tree, no-ops on absence") {
      val be = mkBe()
      val root = mkRoot()
      rawMkdir(s"$root/d/nested")
      rawPut(s"$root/d/nested/f", "x")
      be.deleteRecursively(s"$root/d")
      assert(!be.exists(s"$root/d"))
      be.deleteRecursively(s"$root/d") // already gone: no-op, no throw
    }

    test(s"[$name] a failed writeAtomic leaks no tmp sibling into list()") {
      val be = mkBe()
      val root = mkRoot()
      rawMkdir(root)
      name match {
        case "objectstore" =>
          // single-PUT backends CANNOT leak: no tmp object ever exists.
          // 50 flips later the parent lists exactly the pointer object.
          for (i <- 1 to 50) be.writeAtomic(s"$root/t.CURRENT", s"v$i")
          assert(be.list(root).map(_.name) == Seq("t.CURRENT"))
        case _ =>
          // force the publish to fail AFTER the tmp write: the target is a
          // non-empty directory, so the atomic move must throw — and the
          // tmp sibling must be cleaned up before the rethrow
          rawMkdir(s"$root/t.CURRENT")
          rawPut(s"$root/t.CURRENT/occupant", "x")
          intercept[Exception] { be.writeAtomic(s"$root/t.CURRENT", "v1") }
          val leaked = be.list(root).map(_.name).filter(_.contains(".tmp-"))
          assert(leaked.isEmpty, s"tmp siblings leaked: $leaked")
      }
    }
  }

  test("PosixMetaBackend refuses URI paths loudly (misconfigured remote deployment)") {
    // the silent alternative is every remote pointer reading as absent —
    // version chain restarts at v1 and GC collects live versions
    intercept[IllegalArgumentException] {
      PosixMetaBackend.readString("hdfs://nn/artifacts/t.CURRENT")
    }
    intercept[IllegalArgumentException] {
      PosixMetaBackend.writeAtomic("s3a://bucket/t.CURRENT", "v1 1")
    }
    intercept[IllegalArgumentException] {
      PosixLeaseBackend.createIfAbsent("s3a://bucket/t.WRITER.LEASE", "x 1")
    }
  }

  private def withMetaBackend[T](be: MetaBackend)(body: => T): T = {
    val prev = Versioned.metaBackend
    Versioned.metaBackend = be
    try body finally Versioned.metaBackend = prev
  }

  /** Leased store verbs (ChunkStore/FpStore since round 18) on a mem://
    * data plane need the CAS lease reference too — POSIX file locks
    * cannot arbitrate an object-store path (loud refusal, asserted
    * above).
    */
  private def withLeaseBackend[T](be: LeaseBackend)(body: => T): T = {
    val prev = Versioned.leaseBackend
    Versioned.leaseBackend = be
    try body finally Versioned.leaseBackend = prev
  }

  /** The full-lifecycle matrix runs over the two NON-DEFAULT backends
    * (every other suite in the repo exercises the POSIX default end to
    * end): (name, backend, root factory). The object-store row needs the
    * `mem://` data plane registered so Versioned's parquet write/read and
    * the meta plane share the bucket.
    */
  private def lifecycleBackends: Seq[(String, () => MetaBackend, () => String)] = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mem.impl", classOf[MemFileSystem].getName)
    Seq(
      ("hadoop", () => new HadoopMetaBackend(
        spark.sparkContext.hadoopConfiguration), mkLocalRoot _),
      ("objectstore", () => ObjectStoreMetaBackend, mkMemRoot _))
  }

  for ((name, mkBe, mkRoot) <- lifecycleBackends) {

    test(s"[$name] Versioned pointer lifecycle: publish / re-publish / GC / read-back") {
      import spark.implicits._
      val be = mkBe()
      withMetaBackend(be) {
        val root = mkRoot()
        def pub(n: Int): Unit = Versioned.publish(root, "t", n.toLong) { dir =>
          Seq.fill(n)(n).toDF("v").write.parquet(dir)
        }
        pub(1); val v1 = Versioned.readPointer(root, "t").get.dir
        pub(2); val v2 = Versioned.readPointer(root, "t").get.dir
        pub(3)
        val cur = Versioned.readPointer(root, "t").get
        assert(cur.dir.startsWith("t-v3-") && cur.watermark == 3L)
        // GC: immediately-previous version kept, older collected — through
        // the backend's list/deleteRecursively, not java.io
        assert(be.exists(s"$root/$v2"))
        assert(!be.exists(s"$root/$v1"))
        assert(Versioned.read(spark, root, "t").count() == 3)
        assert(Versioned.partFileCount(root, "t") >= 1)
      }
    }

    test(s"[$name] RowCountCache fingerprint moves on mutation") {
      import spark.implicits._
      withMetaBackend(mkBe()) {
        val root = mkRoot()
        Versioned.publish(root, "t", 1L)(d => Seq(1, 2).toDF("v").write.parquet(d))
        var computes = 0
        def count() = RowCountCache.countFor(root, "t") {
          computes += 1; Versioned.read(spark, root, "t").count()
        }
        assert(count() == 2 && computes == 1)
        assert(count() == 2 && computes == 1) // memo hit: token unchanged
        Versioned.publish(root, "t", 2L)(d => Seq(1, 2, 3).toDF("v").write.parquet(d))
        assert(count() == 3 && computes == 2) // re-point moved the token
      }
    }

    test(s"[$name] FpStore vacuum publishes behind the pointer: concurrent reader kept, crash orphan GC'd") {
      // the round-18 "Missing #2" drill: the fp store's maintenance verb
      // on the non-default meta planes — latest-wins upsert, a reader
      // resolved mid-vacuum keeps its version (keep-previous GC), a
      // crash-between-write-and-flip orphan version is never served and
      // the next publication collects it
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val be = mkBe()
      withMetaBackend(be) {
        withLeaseBackend(new InMemoryCasLeaseBackend) {
          val root = s"${mkRoot()}/fp"
          def vecs(rows: (Long, Float)*) = rows.toSeq
            .map { case (id, v) => (id, 0, Seq(v)) }
            .toDF("vec_id", "label", "embedding")
          FpStore.upsert(spark, root, vecs(1L -> 1f, 2L -> 2f))
          FpStore.upsert(spark, root, vecs(2L -> 9f, 3L -> 3f))
          assert(FpStore.read(spark, root).filter(col("vec_id") === 2L)
            .select("embedding").as[Seq[Float]].head() == Seq(9f),
            "latest-wins resolution on the backend's data plane")
          // crash emulation: a version dir written but never pointed at
          // (same version number as a live one, the real crash shape —
          // the retry re-publishes the number under a fresh suffix)
          val orphan = s"$root/data-v1-crashed-0"
          vecs(7L -> 7f).withColumn("seq", org.apache.spark.sql.functions.lit(99L))
            .write.parquet(orphan)
          val preFlip = FpStore.read(spark, root)
          FpStore.vacuum(spark, root, Seq(1L, 2L).toDF("vec_id"))
          assert(preFlip.count() == 3,
            "a reader that resolved just before the vacuum's flip keeps its files")
          assert(FpStore.read(spark, root)
            .select("vec_id").as[Long].collect().toSet == Set(1L, 2L),
            "vacuum bounds the store to the membership — the orphan is never served")
          // next publication's GC collects everything older than the
          // version that was current just before ITS flip
          FpStore.vacuum(spark, root, Seq(1L).toDF("vec_id"))
          assert(!be.exists(orphan),
            "a crashed publication's orphan version dir is GC'd")
          assert(FpStore.maxSeq(spark, root) == 1L,
            "the seq watermark axis survives both vacuums")
        }
      }
    }
  }

  test("mem:// input stream honors the InputStream read contract at EOF") {
    // InputStream.read(buf, off, len) must return 0 for len == 0 — even
    // at end-of-stream; -1 there reads as spurious EOF to parquet/Hadoop
    // readers that issue zero-length reads while buffering.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.mem.impl", classOf[MemFileSystem].getName)
    val p = new org.apache.hadoop.fs.Path(s"${mkMemRoot()}/contract.bin")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](8)
      assert(in.read(buf, 0, 0) == 0)      // zero-length read mid-stream
      assert(in.read(buf, 0, 8) == 3)      // drains the object
      assert(in.read(buf, 0, 0) == 0)      // zero-length read AT EOF: 0, not -1
      assert(in.read(buf, 0, 8) == -1)     // real EOF still signals -1
      assert(in.read() == -1)
    } finally in.close()
  }

  test("ChunkStore ensure/upsert/compact lifecycle runs on the object-store data plane (mem://)") {
    // the INGEST store's committer path on object-store semantics: ensure
    // (pointer-published empty version), idempotent re-ensure, two
    // Append-mode upserts with overlapping keys (anti-join merge reads
    // the store back through mem:// and the second commit appends into a
    // NON-empty version directory), then delete + compact — the round-18
    // pointer-flip compact that replaced the POSIX two-rename swap runs
    // on an object store with NO special-casing (the `://` refusal is
    // gone because the rename is gone)
    spark.sparkContext.hadoopConfiguration
      .set("fs.mem.impl", classOf[MemFileSystem].getName)
    withMetaBackend(ObjectStoreMetaBackend) {
      withLeaseBackend(new InMemoryCasLeaseBackend) {
        val store = s"${mkMemRoot()}/chunks"
        ChunkStore.ensure(spark, store)
        ChunkStore.ensure(spark, store) // idempotent: no truncate, no throw
        assert(ChunkStore.readPhysical(spark, store).count() == 0)
        def batch(rows: Seq[(String, String)]) = {
          import org.apache.spark.sql.Row
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows.map { case (id, h) =>
              Row(id, s"content $id", null, s"$id.txt", 0, h, null, "txt", null, null)
            }),
            graft.schemas.Schemas.chunkStore)
        }
        ChunkStore.upsert(spark, batch(Seq(("a", "h1"), ("b", "h2"))), store)
        // overlapping batch: h2 must be skipped (first arrival), h3 appended
        ChunkStore.upsert(spark, batch(Seq(("b2", "h2"), ("c", "h3"))), store)
        val got = ChunkStore.readPhysical(spark, store)
          .select("id", "text_hash").collect().map(r => (r.getString(0), r.getString(1))).sorted
        assert(got.toSeq == Seq(("a", "h1"), ("b", "h2"), ("c", "h3")))
        // delete + pointer-flip compact on the object store; a reader
        // that resolved the pre-flip version keeps its files
        import spark.implicits._
        ChunkStore.delete(spark, store, Seq("h2").toDF("text_hash"))
        val preFlip = ChunkStore.readPhysical(spark, store)
        ChunkStore.compact(spark, store)
        assert(preFlip.count() == 3,
          "keep-previous GC: a pre-flip reader's version stays readable")
        assert(ChunkStore.readPhysical(spark, store).count() == 2 &&
          Tombstones.read(spark, s"$store.ts").isEmpty,
          "compact applies tombstones physically and clears the sidecar")
      }
    }
  }

  test("object-store writeAtomic is rename-free: pointer flips PUT, nothing else") {
    // the design claim in MetaBackend's scaladoc, asserted: after a flip
    // the bucket holds exactly the pointer object at that key — no tmp,
    // no rename artifacts, one object write per publication
    val root = mkMemRoot()
    val (bucket, rootKey) = MemObjectStore.parse(root)
    ObjectStoreMetaBackend.writeAtomic(s"$root/t.CURRENT", "t-v1-x 1")
    ObjectStoreMetaBackend.writeAtomic(s"$root/t.CURRENT", "t-v2-x 2")
    val keys = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      bucket.objects.forEach((k, _) => if (k.startsWith(rootKey)) buf += k)
      buf.toSeq
    }
    assert(keys == Seq(s"$rootKey/t.CURRENT"))
    assert(ObjectStoreMetaBackend.readString(s"$root/t.CURRENT")
      .contains("t-v2-x 2"))
  }
}

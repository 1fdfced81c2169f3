package graft.sources

import graft.SparkTestBase

/** Conformance matrix for the artifact metadata plane ([[MetaBackend]]):
  * every primitive drilled over BOTH shipped implementations, plus the
  * full Versioned pointer lifecycle (publish / re-publish / GC / reader
  * resolve) and a store freshness fingerprint run with the Hadoop backend
  * installed — so the pointer protocol is proven against the interface,
  * not against POSIX behavior it happened to inherit.
  */
class MetaBackendSpec extends SparkTestBase {

  private def mkRoot() =
    java.nio.file.Files.createTempDirectory("graft_meta").toString

  private def backends: Seq[(String, () => MetaBackend)] = Seq(
    ("posix", () => PosixMetaBackend),
    ("hadoop", () => new HadoopMetaBackend(
      spark.sparkContext.hadoopConfiguration)))

  for ((name, mkBe) <- backends) {

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
      assert(be.list(s"$root/missing").isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/part-00000"), "12345")
      new java.io.File(s"$root/sub").mkdirs()
      val entries = be.list(root).sortBy(_.name)
      assert(entries.map(_.name) == Seq("part-00000", "sub"))
      assert(entries.head.size == 5 && !entries.head.isDir)
      assert(entries(1).isDir)
    }

    test(s"[$name] deleteRecursively removes a tree, no-ops on absence") {
      val be = mkBe()
      val root = mkRoot()
      new java.io.File(s"$root/d/nested").mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/d/nested/f"), "x")
      be.deleteRecursively(s"$root/d")
      assert(!be.exists(s"$root/d"))
      be.deleteRecursively(s"$root/d") // already gone: no-op, no throw
    }
  }

  private def withMetaBackend[T](be: MetaBackend)(body: => T): T = {
    val prev = Versioned.metaBackend
    Versioned.metaBackend = be
    try body finally Versioned.metaBackend = prev
  }

  test("Versioned pointer lifecycle runs green with the Hadoop backend installed") {
    import spark.implicits._
    withMetaBackend(new HadoopMetaBackend(spark.sparkContext.hadoopConfiguration)) {
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
      assert(new java.io.File(s"$root/$v2").exists())
      assert(!new java.io.File(s"$root/$v1").exists())
      assert(Versioned.read(spark, root, "t").count() == 3)
      assert(Versioned.partFileCount(root, "t") >= 1)
    }
  }

  test("RowCountCache fingerprint moves on mutation under the Hadoop backend") {
    import spark.implicits._
    withMetaBackend(new HadoopMetaBackend(spark.sparkContext.hadoopConfiguration)) {
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
}

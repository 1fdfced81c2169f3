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

package graft.operators

import graft.SparkTestBase
import java.nio.file.Files

class MultimodalSpec extends SparkTestBase {

  test("binaryFile source reads a directory of media files (A1 wiring)") {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(dir.resolve("b.img"), "image payload bytes".getBytes)
    Files.write(dir.resolve("skip.txt"), "not matched".getBytes)
    val df = Multimodal.readBinaryDir(spark, dir.toString, "*.img", "image")
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "content", "byte_len", "content_hash", "meta"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet == Set("a_img", "b_img"))
    assert(rows.forall(_.getString(1) == "image"))
    assert(rows.forall(r => r.getAs[Array[Byte]]("content").length == r.getLong(3)))
  }

  test("feature extraction: deterministic, fixed dims, per-partition batch shape") {
    import spark.implicits._
    val media = Seq(
      ("m1", "image", "payload one".getBytes),
      ("m2", "image", "payload two".getBytes),
      ("m3", "image", Array.empty[Byte])
    ).toDF("media_id", "modality", "content")
    val f1 = Multimodal.extractFeatures(spark, media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(spark, media).orderBy("media_id").collect()
    assert(f1.map(_.toString).sameElements(f2.map(_.toString)))
    assert(f1.forall(_.getAs[scala.collection.Seq[Float]]("features").length == 64))
    // distinct payloads → distinct features
    assert(f1(0).getAs[scala.collection.Seq[Float]]("features") != f1(1).getAs[scala.collection.Seq[Float]]("features"))
  }

  test("resize stub renormalizes payload to the pixel budget and sets dims") {
    import spark.implicits._
    val media = Seq(
      ("big", "image", (0 until 500).map(_.toByte).toArray),
      ("small", "image", Array[Byte](1, 2, 3))
    ).toDF("media_id", "modality", "content")
    val out = Multimodal.resize(spark, media, 32, 32).orderBy("media_id").collect()
    // 32*32/16 = 64-byte budget: big truncated, small zero-padded
    assert(out.forall(_.getAs[Array[Byte]]("content").length == 64))
    assert(out.forall(r => r.getInt(3) == 32 && r.getInt(4) == 32))
  }

  test("frame sampling emits every k-th window with indices") {
    import spark.implicits._
    val media = Seq(("m1", (0 until 100).map(_.toByte).toArray)).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(spark, media, everyK = 2).collect()
    // 100 bytes → 7 windows of 16 → indices 0,2,4,6 sampled
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").nonEmpty))
  }
}

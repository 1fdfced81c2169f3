package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {

  private val e = new HashingEmbedder()

  test("produces 1536-dim unit vectors (ref dims, db_utils.py:33)") {
    val v = e.embed("some sample text for embedding")
    assert(v.length == 1536)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("deterministic across calls") {
    val a = e.embed("hello world")
    val b = e.embed("hello world")
    assert(a.sameElements(b))
  }

  test("different texts produce different vectors") {
    assert(!e.embed("hello world").sameElements(e.embed("goodbye world")))
  }

  test("empty/null text gives zero vector, never throws") {
    assert(e.embed("").forall(_ == 0.0f))
    assert(e.embed(null).forall(_ == 0.0f))
  }

  test("failure path returns exactly [0.0]*dims (ref embedding_utils.py:207-213)") {
    val f = new FailingEmbedder()
    val v = f.embed("anything")
    assert(v.length == 1536 && v.forall(_ == 0.0f))
  }

  test("bucket map pins the md5 contract the d14 oracle recomputes") {
    // Externally computed: h = int(md5(tok)[:8 hex], 16); sign = +1 iff
    // h % 2 == 0; idx = (h >> 1) % 1536. A refactor that drifts any of
    // tokenization, hash, sign rule, or bucket map must fail HERE, not
    // first at the driver's DuckDB gate.
    //   "hello" -> h 1564557354, sign +1, idx 21
    //   "world" -> h 2105094199, sign -1, idx 27
    //   "a"     -> h  214005177, sign -1, idx 220
    val counts = e.rawBucketCounts("Hello  WORLD\ta")
    assert(counts(21) == 1, s"hello bucket: ${counts(21)}")
    assert(counts(27) == -1, s"world bucket: ${counts(27)}")
    assert(counts(220) == -1, s"a bucket: ${counts(220)}")
    assert(counts.map(math.abs).sum == 3)
  }

  test("batch path equals per-item path") {
    val texts = Seq("a b c", "d e f", "")
    val batch = e.embedBatch(texts.iterator).toSeq
    texts.zip(batch).foreach { case (t, v) => assert(e.embed(t).sameElements(v)) }
  }
}

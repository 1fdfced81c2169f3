package graft.operators

import graft.schemas.Schemas
import graft.text.TextKernel
import scala.util.hashing.MurmurHash3

/** text → fixed-dimension float vector (SURVEY.md §2.A A11).
  *
  * The reference calls an external embedding service one chunk at a time
  * (reference embedding_utils.py:189-213) and falls back to a zero vector on
  * any error (embedding_utils.py:207-213). The engine keeps the same
  * interface and fallback semantics but:
  *   - batches per Spark partition (`mapPartitions`) instead of 1 call/chunk —
  *     the §4 batching fix;
  *   - ships a deterministic, zero-egress local implementation (feature
  *     hashing, L2-normalized) so the pipeline is testable and reproducible.
  * A service-backed implementation would implement the same trait and be
  * swapped in per partition.
  */
trait Embedder extends Serializable {
  def dims: Int

  /** Never throws: any failure returns the zero vector (ref semantics). */
  final def embed(text: String): Array[Float] =
    try embedUnsafe(text)
    catch { case _: Throwable => new Array[Float](dims) }

  /** Batch entry point — implementations may amortize setup per batch. */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = texts.map(embed)

  protected def embedUnsafe(text: String): Array[Float]
}

/** Deterministic feature-hashing embedder: murmur3 token hash → signed bucket
  * increment → L2 normalize. Pure function of the text; identical across JVMs
  * and executors (required for oracle determinism).
  */
final class HashingEmbedder(val dims: Int = Schemas.VectorDimensions) extends Embedder {
  protected def embedUnsafe(text: String): Array[Float] = {
    val v = new Array[Float](dims)
    if (text == null) return v
    val toks = TextKernel.tokens(text.toLowerCase(java.util.Locale.ROOT))
    var i = 0
    while (i < toks.length) {
      val h = MurmurHash3.stringHash(toks(i), 0x9747b28c)
      val idx = java.lang.Math.floorMod(h, dims)
      val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
      v(idx) += sign
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dims) { ss += v(i).toDouble * v(i); i += 1 }
    if (ss == 0.0) v
    else {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < dims) { v(i) = (v(i) * inv).toFloat; i += 1 }
      v
    }
  }
}

/** Always-failing embedder — exercises the zero-vector fallback path in tests
  * (ref embedding_utils.py:207-213).
  */
final class FailingEmbedder(val dims: Int = Schemas.VectorDimensions) extends Embedder {
  protected def embedUnsafe(text: String): Array[Float] = sys.error("embedding backend down")
}

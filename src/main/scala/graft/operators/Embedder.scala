package graft.operators

import graft.schemas.Schemas
import graft.text.TextKernel

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

/** Deterministic feature-hashing embedder: md5-derived token hash → signed
  * bucket increment → L2 normalize. Pure function of the text; identical
  * across JVMs and executors.
  *
  * The token hash is the engine-portable [[TextKernel.md5Hash32]] (first 32
  * md5 bits, unsigned) — the same base-hash discipline as the MinHash /
  * SimHash signature families: any engine with md5 (DuckDB, Postgres, Spark
  * SQL) recomputes bucket index and sign exactly, which is what makes the
  * embedding stage oracle-checkable end-to-end (d14) instead of rows-only.
  * Low bit → sign, remaining 31 bits → bucket:
  *   sign = +1 if h % 2 == 0 else -1;  idx = (h / 2) % dims.
  */
final class HashingEmbedder(val dims: Int = Schemas.VectorDimensions) extends Embedder {

  /** Pre-normalization signed bucket counts — the integer-exact state the
    * d14 oracle recomputes in DuckDB. `embedUnsafe` = this + L2 normalize.
    */
  def rawBucketCounts(text: String): Array[Int] = {
    val v = new Array[Int](dims)
    if (text == null) return v
    val toks = TextKernel.tokens(text.toLowerCase(java.util.Locale.ROOT))
    var i = 0
    while (i < toks.length) {
      val h = TextKernel.md5Hash32(toks(i)) // unsigned 32-bit in a Long
      val idx = ((h >>> 1) % dims).toInt
      v(idx) += (if ((h & 1L) == 0L) 1 else -1)
      i += 1
    }
    v
  }

  /** L2-normalize pre-computed bucket counts into the embedding vector —
    * exposed so a caller that already holds the counts (the streaming
    * embed-ingest sink materializes BOTH representations) pays the token
    * hashing once instead of twice. `embedUnsafe` == rawBucketCounts + this.
    */
  def embedFromCounts(counts: Array[Int]): Array[Float] = {
    val v = new Array[Float](dims)
    var ss = 0.0
    var i = 0
    while (i < dims) {
      val c = counts(i).toDouble
      v(i) = counts(i).toFloat
      ss += c * c
      i += 1
    }
    if (ss == 0.0) v
    else {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < dims) { v(i) = (v(i) * inv).toFloat; i += 1 }
      v
    }
  }

  protected def embedUnsafe(text: String): Array[Float] =
    embedFromCounts(rawBucketCounts(text))
}

/** Always-failing embedder — exercises the zero-vector fallback path in tests
  * (ref embedding_utils.py:207-213).
  */
final class FailingEmbedder(val dims: Int = Schemas.VectorDimensions) extends Embedder {
  protected def embedUnsafe(text: String): Array[Float] = sys.error("embedding backend down")
}

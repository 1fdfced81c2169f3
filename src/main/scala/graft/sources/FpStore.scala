package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COLD full-precision vector store an encoded (PQ) serving
  * composition pairs with — the same store every exact re-rank already
  * consults. The encoded artifact deliberately carries no full-precision
  * vectors (one byte per subspace instead of 4·dim is its point, ~32×);
  * that makes it the one geometry that cannot rebuild itself at a new
  * shard count from its own tables (decoding codes would bake
  * quantization error into the new artifact). A streaming-fed encoded
  * index therefore persists each batch's embeddings here, and the growth
  * loop re-encodes from this store.
  *
  * PHYSICAL-ONLY by design — no tombstone sidecar: the serving INDEX's
  * logical membership is the single source of deletion truth, and every
  * consumer of this store semi-joins it ([[readMember]]). Duplicating
  * the delete axis here would have to stay transactionally in step with
  * the index's own sidecars across compacts and re-adds (two delete
  * states that can disagree — exactly the class of silent divergence the
  * round-16 catch-up race came from); one truth + a semi-join cannot
  * disagree with itself. The cost is rows for deleted ids lingering
  * until [[vacuum]] — storage, never served.
  *
  * LATEST-WINS upsert (round 18; the reference's own sink semantics —
  * db_utils.py:169-170, `upload_documents` replaces by key): [[upsert]]
  * is a PURE APPEND stamped with a monotone per-batch `seq`, and every
  * reader resolves max-seq per vec_id. A checkpoint redelivery
  * re-appends the same payload at a higher seq (same resolved row —
  * convergent, storage bounded by [[vacuum]]); a RE-ADD that changes a
  * document's text lands the NEW payload at a higher seq and every
  * consumer — the exact re-rank, the growth re-encode, the catch-up
  * window fetch — serves it. The first-arrival anti-join this replaces
  * was also the store's one corpus-shaped per-batch cost (an id-column
  * scan of the whole store every micro-batch); append + the `seq.META`
  * watermark is ∝ batch.
  *
  * LAYOUT — [[Versioned]] pointer discipline, like every other store
  * (round 18; the two-rename vacuum swap this replaces needed a
  * read-quiesced window and a `://` refusal):
  *
  *   root/data.CURRENT   — atomic pointer to the serving version dir;
  *   root/data-vN-…/     — parquet (vec_id, label, embedding, seq);
  *                         [[upsert]] APPENDS files into the current
  *                         version; [[vacuum]] publishes a rewritten
  *                         next version behind one atomic pointer flip
  *                         (keep-previous GC — a reader that resolved
  *                         the pointer just before the flip keeps its
  *                         files), portable to all MetaBackends;
  *   root/seq.META       — the last CLAIMED upsert seq. Claim-first
  *                         crash ordering: a crash between the claim and
  *                         the append leaves a harmless gap, never a
  *                         reused seq. Writers serialize on the root's
  *                         writer lease ([[Versioned.withWriterLease]] —
  *                         upsert and vacuum hold the same lease, so a
  *                         vacuum can no longer race an upsert's files
  *                         out of the swap).
  */
object FpStore {

  private val DataName = "data"

  private def seqMetaFile(path: String) = s"$path/seq.META"

  /** The serving version's parquet directory, if any version published. */
  private def currentDir(path: String): Option[String] =
    Versioned.readPointer(path, DataName).map(c => s"$path/${c.dir}")

  /** Raw rows (vec_id, label, embedding, seq) of the serving version —
    * may hold several seq-stamped versions of one id; [[latest]]
    * resolves. Loud on a store no upsert ever created.
    */
  private def raw(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentDir(path).getOrElse(throw new IllegalStateException(
      s"fp store at $path has no published version (no upsert ever ran)")))

  /** Max-seq-per-id resolution — the latest-wins read axis. Keeps `seq`
    * (the surviving row's stamp) so [[vacuum]]'s rewrite preserves the
    * watermark axis; callers that don't want it select it away.
    */
  private def latest(df: DataFrame): DataFrame =
    df.groupBy(col("vec_id"))
      .agg(max_by(struct(col("seq"), col("label"), col("embedding")),
        col("seq")).as("__r"))
      .select(col("vec_id"), col("__r.label").as("label"),
        col("__r.embedding").as("embedding"), col("__r.seq").as("seq"))

  /** Append `batch` (vec_id, label, embedding) stamped with the next
    * claimed `seq` — latest-wins, ∝ batch (no store read: the watermark
    * comes from `seq.META`, claimed BEFORE the write so a crash leaves a
    * gap, never a reuse; legacy stores without the sidecar fall back to
    * one max(seq) scan). Every row of one upsert shares one seq, so each
    * parquet file carries a CONSTANT seq whose min/max footer stats let
    * [[since]] prune all pre-watermark files from a delta fetch.
    * Serialized with [[vacuum]] by the root's writer lease.
    */
  def upsert(spark: SparkSession, path: String, batch: DataFrame): Unit =
    Versioned.withWriterLease(path) {
      // the root dir must exist before the seq claim's sidecar write
      // (writeAtomic does not create parents; object-store backends have
      // no directories, so only genuinely-local paths need this)
      if (!path.contains("://")) new java.io.File(path).mkdirs()
      val deduped = batch.select(col("vec_id"), col("label"), col("embedding"))
        .dropDuplicates("vec_id")
      val seq = claimSeq(spark, path)
      val stamped = deduped.withColumn("seq", lit(seq))
      currentDir(path) match {
        case Some(dir) => stamped.write.mode("append").parquet(dir)
        case None =>
          Versioned.publish(path, DataName, watermark = seq) { dir =>
            stamped.write.mode("errorifexists").parquet(dir)
          }
      }
    }

  /** Claim the next seq: bump `seq.META` atomically (under the caller's
    * writer lease) and return the claimed value. Falls back to a data
    * scan when the sidecar is absent (legacy store / first upsert).
    */
  private def claimSeq(spark: SparkSession, path: String): Long = {
    val last = Versioned.metaBackend.readString(seqMetaFile(path))
      .flatMap(_.trim.toLongOption)
      .getOrElse(scanMaxSeq(spark, path))
    val next = last + 1
    Versioned.metaBackend.writeAtomic(seqMetaFile(path), next.toString)
    next
  }

  /** max(seq) from the data itself (−1 on absent/empty). */
  private def scanMaxSeq(spark: SparkSession, path: String): Long =
    currentDir(path) match {
      case None => -1L
      case Some(dir) =>
        val row = spark.read.parquet(dir).agg(max(col("seq"))).head()
        if (row.isNullAt(0)) -1L else row.getLong(0)
    }

  /** The latest claimed upsert seq (−1 on an absent/empty store) — the
    * watermark a snapshot captures so a later [[since]] serves exactly
    * the window's upserts. `seq.META` when present (O(1), no scan; it
    * can exceed the data max only by crash gaps, which is the
    * conservative direction — a too-high watermark shrinks the window
    * and the replay's coverage check degrades to the full fetch, never
    * drops), else one column-pruned aggregate.
    */
  def maxSeq(spark: SparkSession, path: String): Long =
    Versioned.metaBackend.readString(seqMetaFile(path))
      .flatMap(_.trim.toLongOption)
      .getOrElse(scanMaxSeq(spark, path))

  /** Rows upserted after `watermark`, LATEST-RESOLVED within the window
    * — file-stats-pruned (each file's constant seq makes `seq > w` skip
    * pre-watermark files without reading their payload bytes), so the
    * resolution aggregate is ∝ window, and seq monotonicity makes
    * latest-in-window = latest-overall for every id the window holds.
    */
  def since(spark: SparkSession, path: String, watermark: Long): DataFrame =
    latest(raw(spark, path).filter(col("seq") > watermark))
      .select("vec_id", "label", "embedding")

  /** The store resolved latest-per-id (payloads for every id ever
    * upserted, each at its newest seq). The resolution aggregate is
    * store-shaped — same cost class as the dedup this store's readers
    * always carried; [[vacuum]] makes the store unique-by-construction
    * again, and delta paths use [[since]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    latest(raw(spark, path)).select("vec_id", "label", "embedding")

  /** The store scoped to a MEMBERSHIP frame (one `vec_id` column — the
    * serving index's logical view): the rebuild/re-rank corpus. Deleted
    * ids fall out here because they fall out of the membership, not
    * because this store tracks them; re-added ids resolve to their
    * NEWEST payload (latest-wins), so a growth rebuild re-encodes what
    * the user last wrote. Semi-join first (narrows to members), then
    * the max-seq resolution over member rows only.
    */
  def readMember(spark: SparkSession, path: String,
                 membership: DataFrame): DataFrame =
    latest(raw(spark, path).join(membership.select("vec_id").distinct(),
      Seq("vec_id"), "left_semi"))
      .select("vec_id", "label", "embedding")

  /** Bound the lingering storage (deleted ids' rows, superseded
    * versions): publish a NEXT version holding only the latest row per
    * member id, behind the same [[Versioned]] pointer flip every other
    * store compacts through — crash-safe (a crash mid-write leaves an
    * orphan version the next publish GCs; the pointer never references
    * an incomplete version), reader-safe (keep-previous GC: a reader
    * that resolved the pointer just before the flip keeps its version),
    * and portable to every MetaBackend (no POSIX rename, no `://`
    * refusal, no read-quiesced window). Each row keeps ITS seq, so a
    * catch-up watermark taken before the vacuum stays comparable.
    * Serialized with [[upsert]] by the shared writer lease — a racing
    * sink batch either lands before the vacuum's read or waits.
    */
  def vacuum(spark: SparkSession, path: String,
             membership: DataFrame): Unit =
    Versioned.withWriterLease(path) {
      val clean = latest(raw(spark, path)
        .join(membership.select("vec_id").distinct(), Seq("vec_id"), "left_semi"))
      Versioned.publish(path, DataName, watermark = maxSeq(spark, path)) {
        dir => clean.write.mode("errorifexists").parquet(dir)
      }
    }
}

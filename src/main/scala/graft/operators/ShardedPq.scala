package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded IVF-PQ — the composition of the engine's two scale answers,
  * and the true 100 TB ANN design point: [[ShardedIvf]] takes the
  * coarse geometry past one quantizer's broadcast ceiling, and PQ takes
  * the per-vector memory down 32× (one byte per subspace instead of
  * 4·dim bytes — at the reference's 1536-d (db_utils.py:33) a
  * full-precision shard is ~6 KB/vector, untenable exactly where
  * sharding is needed). S independent IVF-PQ sub-indexes over the same
  * disjoint `pmod(xxhash64(vec_id), S)` partition ([[Sharding]] — same
  * routing, same `shards.META` guard, same build machinery):
  *
  *   - BUILD: one tagging pass, concurrent pruned per-shard
  *     [[graft.sources.VectorIndexStore.buildPqAt]] — each shard
  *     carries the full PQ lifecycle plane (coarse model, codebooks,
  *     cell-partitioned one-byte codes, qerr quantization watermarks,
  *     versioned baseline). Per-shard coarse cells default to
  *     `autoCells` of the shard's rows (constant occupancy).
  *   - MAINTENANCE: appends hash-route to the per-shard `appendPq`
  *     (anti-join idempotence, quantization watermark);
  *     [[retrainIfNeeded]] judges drift PER SHARD and retrains from the
  *     caller-supplied full-precision corpus slice (the PQ artifact
  *     deliberately carries no full-precision vectors — at scale the
  *     slice is a pruned read of the same cold store the re-rank
  *     already consults); [[compactShards]] rewrites fragmented cell
  *     directories per shard behind Versioned pointers.
  *   - PROBE ([[AnnEval.shardedPqTopK]] / [[search]]): each shard ADC-
  *     scores its probed cells and keeps ITS shortlist (per-shard rank
  *     — membership is disjoint, so shortlists union without loss),
  *     one exact cosine re-rank of the unioned shortlists against the
  *     full-precision store, one global top-k. Driver memory peaks at
  *     one shard's (coarse + codebooks) at a time.
  *   - CALIBRATION
  *     ([[graft.sources.VectorIndexStore.calibrateShardedPqShortlist]]):
  *     the one-pass recall-vs-shortlist curve generalizes — a true
  *     neighbor enters the answer iff its cell is probed AND its
  *     per-(query, SHARD) ADC rank is <= the per-shard shortlist, so
  *     the capture width is one window over the unioned ADC frames.
  *     One `shortlist.CAL` at the sharded root (per-shard depth),
  *     honored by the [[PqIndex.ShortlistCalibrated]] sentinel,
  *     invalidated by any shard's retrain.
  *
  * RESHARD: an encoded composition reshards by RE-ENCODING from the
  * full-precision store at S′ (the artifact-sourced reshard of
  * [[ShardedIvf]] does not apply — PQ shards hold codes, not vectors,
  * and decoding codes would bake quantization error into the new
  * artifact). `VectorIndexStore.reshardShardedPq` wraps that build in
  * the same collision-guarded atomic publish + GC as the IVF one.
  */
object ShardedPq {

  /** The shard count recorded at build time (`shards.META`). */
  def shardCount(path: String): Option[Int] = Sharding.shardCount(path)

  /** Build S independent IVF-PQ artifacts under `path/shard=r` — one
    * tagging pass, concurrent pruned per-shard PQ builds
    * ([[ShardedIvf.BuildParallelism]]-bounded, same conf override).
    */
  def build(spark: SparkSession, vectors: DataFrame, path: String,
            shards: Int, nCellsPerShard: Int = -1): Unit =
    Sharding.buildSharded(spark, vectors, path, shards,
      (dir, part, n) => {
        val cells =
          if (nCellsPerShard > 0) nCellsPerShard
          else graft.sources.VectorIndexStore.autoCells(n)
        graft.sources.VectorIndexStore.buildPqAt(spark, dir, part, cells)
      })

  /** Hash-route `newVectors` to their shards and append each slice
    * through the per-shard `appendPq` (existing-codebook encode, vec_id
    * anti-join idempotence, quantization watermark).
    */
  def append(spark: SparkSession, path: String, shards: Int,
             newVectors: DataFrame): Unit =
    Sharding.appendRouted(spark, path, shards, newVectors,
      (shardPath, slice) =>
        graft.sources.VectorIndexStore.appendPq(spark, shardPath, slice))

  /** DELETE from the encoded composition — [[ShardedIvf.delete]] with
    * the per-shard `deletePq`: the owning shards' tombstones anti-join
    * their encoded tables before every ADC scan, so deleted codes never
    * occupy shortlist slots anywhere in the union. Physical at each
    * shard's next compact or retrain (whose re-encode excludes them).
    */
  def delete(spark: SparkSession, path: String, shards: Int,
             ids: DataFrame): Unit =
    Sharding.deleteRouted(spark, path, shards, ids,
      (shardPath, slice) =>
        graft.sources.VectorIndexStore.deletePq(spark, shardPath, slice))

  /** CATCH-UP reshard for the ENCODED composition, phase 1 of 2 — the
    * bounded-stall protocol ([[ShardedIvf.reshardCatchUpBuild]]'s shape)
    * at the geometry that serves at 100 TB. Takes NO lease on the old
    * root: the corpus-sized RE-ENCODE (from the cold full-precision
    * store scoped to the old root's logical membership — PQ shards hold
    * codes, so re-encoding from fp is the only reshard source that does
    * not bake quantization error in) runs while appends keep landing on
    * the old generation. MUST be followed by [[reshardCatchUpReplay]]
    * before cutover.
    *
    * No journal and no watermark sidecar, unlike the IVF protocol: the
    * encoded tables are ~32× narrower than full-precision (one byte per
    * subspace), so the replay's delta discovery is an id-column
    * anti-join over CODES — already the cheap shape the IVF append log
    * exists to reach. The snapshot is simply the membership the build
    * read; deltas and removals are recomputed against it structurally.
    */
  def reshardCatchUpBuild(spark: SparkSession, oldPath: String,
                          oldShards: Int, newPath: String, newShards: Int,
                          fpPath: String, nCellsPerShard: Int = -1): Unit = {
    require(newPath != oldPath,
      "reshard builds at a NEW root (shard count is part of the artifact " +
        "identity; in-place cutover would break readers holding the old S)")
    Sharding.verifyShards(oldPath, oldShards)
    // fp watermark captured BEFORE the membership read — the conservative
    // direction: an upsert racing the capture lands above the watermark
    // AND (if its codes landed too) in the snapshot, and the replay's
    // delta semi-join absorbs the overlap
    val fpw = graft.sources.FpStore.maxSeq(spark, fpPath)
    val membership = (0 until oldShards).map { r =>
      PqIndex.loadEncoded(spark, s"$oldPath/shard=$r").select("vec_id")
    }.reduce(_ unionAll _)
    val corpus = graft.sources.FpStore.readMember(spark, fpPath, membership)
    build(spark, corpus, newPath, newShards, nCellsPerShard)
    // a reused target root must not serve a depth sized for another S
    graft.sources.Versioned.metaBackend.deleteRecursively(s"$newPath/shortlist.CAL")
    // recorded at the NEW root so the replay (possibly another process)
    // can fetch the window's payloads file-pruned instead of re-reading
    // the full-width fp store
    graft.sources.Versioned.metaBackend.writeAtomic(s"$newPath/catchup.META",
      s"fpw:$fpw")
  }

  /** CATCH-UP reshard phase 2 — the ONLY window external appenders
    * block: under the old root's writer lease, reconcile BOTH axes with
    * id-column anti-joins over the narrow encoded tables:
    *
    *   - APPENDS that landed during phase 1: old-logical ids absent from
    *     the new root's physical codes → their full-precision rows fetch
    *     from the fp store and re-encode through the idempotent
    *     [[append]]. Every appender must [[graft.sources.FpStore.upsert]]
    *     BEFORE appending codes (the sinks do; the require makes an
    *     appender that skipped it loud, not a silent drop).
    *   - DELETES that landed during phase 1: new-physical ids absent
    *     from the old LOGICAL view (pending tombstones AND
    *     applied-and-cleared ones alike — the reverse delta, so a
    *     mid-window compact cannot resurrect a takedown) → tombstoned on
    *     the new root, anti-joined against its existing tombstones so a
    *     repeated replay is a no-op.
    *
    * Naturally idempotent with no watermark state: after a replay the
    * new root's physical ids ⊇ the old logical view, so a repeat serves
    * an empty delta. The caller cuts over inside the same lease scope.
    * Returns the replayed append count.
    */
  def reshardCatchUpReplay(spark: SparkSession, oldPath: String,
                           oldShards: Int, newPath: String, newShards: Int,
                           fpPath: String): Long = {
    Sharding.verifyShards(oldPath, oldShards)
    graft.sources.Versioned.withWriterLease(oldPath) {
      val newPhysical = (0 until newShards).map { r =>
        PqIndex.loadEncodedRaw(spark, s"$newPath/shard=$r").select("vec_id")
      }.reduce(_ unionAll _)
      val oldLogical = (0 until oldShards).map { r =>
        PqIndex.loadEncoded(spark, s"$oldPath/shard=$r").select("vec_id")
      }.reduce(_ unionAll _)
      // materialized ONCE (eager local checkpoint): the delta plan reads
      // both roots' id columns, and its consumers (count, the window
      // fetch's semi-join, S per-shard append slices) would each
      // re-evaluate those corpus-id scans — and a plain persist would be
      // UNSAFE here (the append below refreshes the new root's listing,
      // invalidating a cached plan over it; the checkpoint pins the data)
      val delta = graft.operators.ScaleOps.checkpointed(
        oldLogical.join(newPhysical, Seq("vec_id"), "left_anti").distinct())
      val n = delta.count()
      if (n > 0) {
        // Payload fetch, DELTA-SHAPED when possible: the snapshot's fp
        // watermark (catchup.META) + FpStore's per-batch seq stamps let
        // the scan prune every pre-window file by footer stats — the
        // blocked window must not re-read the full-width fp store to
        // fetch a batch-sized delta (the same corpus-re-read smell the
        // IVF append journal closed; here the fp store's own append-only
        // layout is the journal). FpStore.since/read resolve max-seq per
        // id (latest-wins), so a window re-add serves its NEWEST
        // payload. Falls back to the full semi-join scan when the
        // watermark is absent (legacy snapshot) or the window files
        // don't cover the delta (an appender that upserted fp BEFORE
        // the snapshot but appended codes after — legal under the
        // upsert-then-append contract). Each fetch is materialized ONCE
        // (checkpoint) and its count reused: the coverage check, the
        // require, and the S routed append slices must not re-run the
        // fp-window join per consumer.
        val fpw = graft.sources.Versioned.metaBackend
          .readString(s"$newPath/catchup.META")
          .map(_.trim).filter(_.startsWith("fpw:"))
          .flatMap(_.stripPrefix("fpw:").toLongOption)
        val windowRows = fpw.map(w => graft.operators.ScaleOps.checkpointed(
          graft.sources.FpStore.since(spark, fpPath, w)
            .join(delta, Seq("vec_id"), "left_semi")))
        val rows = windowRows.filter(_.count() == n).getOrElse {
          graft.operators.ScaleOps.checkpointed(
            graft.sources.FpStore.read(spark, fpPath)
              .join(delta, Seq("vec_id"), "left_semi"))
        }
        val got = rows.count()
        require(got == n,
          s"catch-up replay found $n window appends but only $got have " +
            "full-precision rows — every appender must FpStore.upsert " +
            "before appending codes, or the replay would silently drop " +
            "the difference")
        append(spark, newPath, newShards, rows)
      }
      // advance the watermark so a repeated replay's (empty) fetch stays
      // file-pruned too
      graft.sources.Versioned.metaBackend.writeAtomic(
        s"$newPath/catchup.META",
        s"fpw:${graft.sources.FpStore.maxSeq(spark, fpPath)}")
      val alreadyHidden = (0 until newShards).flatMap(r =>
        graft.sources.Tombstones.read(spark, s"$newPath/shard=$r")
          .map(_.select(org.apache.spark.sql.functions.col("doc_id")
            .as("vec_id"))))
      val removed0 = newPhysical
        .join(oldLogical, Seq("vec_id"), "left_anti").distinct()
      // same one-evaluation materialization: isEmpty + S routed delete
      // slices would otherwise re-run the reverse-delta scans each
      val removed = graft.operators.ScaleOps.checkpointed(
        if (alreadyHidden.isEmpty) removed0
        else removed0.join(alreadyHidden.reduce(_ unionAll _),
          Seq("vec_id"), "left_anti"))
      if (!removed.isEmpty) delete(spark, newPath, newShards, removed)
      n
    }
  }

  /** Per-shard drift check + recall-gated retrain (`retrainPqIfNeeded`
    * on each shard artifact, fed the hash-routed slice of the
    * caller-supplied full-precision corpus). Sequential by design, like
    * [[ShardedIvf.retrainIfNeeded]]. Returns the number of shards
    * retrained; each retrain invalidates the sharded root's
    * `shortlist.CAL` (a depth sized for the old geometry is stale).
    */
  def retrainIfNeeded(spark: SparkSession, path: String, shards: Int,
                      fullPrecision: DataFrame, factor: Double = 2.0,
                      recallFloor: Double = 0.2,
                      nProbe: Int = IvfIndex.NProbeAuto, k: Int = 10,
                      shortlist: Int = PqIndex.DefaultShortlist,
                      continueOnGateFailure: Boolean = false): Int = {
    Sharding.verifyShards(path, shards)
    val tagged = fullPrecision
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("shard", Sharding.shardCol(shards))
    (0 until shards).count { r =>
      // continueOnGateFailure: same contract as ShardedIvf.retrainIfNeeded
      // (a streaming caller must not let one gate-failing shard starve
      // the rest of the sweep; offline callers keep the loud default)
      try graft.sources.VectorIndexStore.retrainPqIfNeeded(
        spark, s"$path/shard=$r",
        tagged.filter(col("shard") === r).drop("shard"),
        factor, recallFloor, nProbe, k, shortlist)
      catch {
        case e: graft.sources.VectorIndexStore.RetrainRecallGateFailed
            if continueOnGateFailure =>
          System.err.println(
            s"[graft] shard $r retrain skipped (recall gate): ${e.getMessage}")
          false
      }
    }
  }

  /** Per-shard small-file compaction (`compactPq` on each shard). */
  def compactShards(spark: SparkSession, path: String, shards: Int): Unit = {
    Sharding.verifyShards(path, shards)
    (0 until shards).foreach { r =>
      val shardPath = s"$path/shard=$r"
      val nCells = PqIndex.loadModel(spark, shardPath).coarse.centroids.length
      graft.sources.VectorIndexStore.compactPq(spark, shardPath, nCells)
    }
  }

  /** Per-shard tombstone-fraction compaction sweep
    * ([[ShardedIvf.compactShardsIfDeleted]] on the encoded composition).
    * Returns the number of shards compacted.
    */
  def compactShardsIfDeleted(spark: SparkSession, path: String, shards: Int,
                             maxDeletedFraction: Double = 0.1): Int = {
    Sharding.verifyShards(path, shards)
    (0 until shards).count { r =>
      graft.sources.VectorIndexStore.compactPqIfDeleted(
        spark, s"$path/shard=$r", maxDeletedFraction)
    }
  }

  /** Single-query top-k over all shards: per-shard ADC shortlist (each
    * with ITS model's resolved `nProbe` and the resolved per-shard
    * `shortlist`), exact re-rank of the unioned shortlists against the
    * full-precision store, one global TakeOrdered.
    */
  def search(spark: SparkSession, path: String, shards: Int,
             fullPrecision: DataFrame, query: Seq[Float], k: Int,
             nProbe: Int = IvfIndex.NProbeAuto,
             shortlist: Int = PqIndex.DefaultShortlist): DataFrame =
    searchFiltered(spark, path, shards, fullPrecision, query, k, nProbe,
      shortlist, predicate = None)

  /** [[search]] scoped by a metadata predicate — filtered vector search
    * on the ENCODED composition (the reference's surface pairs
    * filterable fields with the vector field, db_utils.py:65-70 +
    * 58-64). The predicate applies to each shard's encoded frame BEFORE
    * its ADC scan — the encoded table carries the filter column next to
    * the codes (`(vec_id, label, cell, code)`, [[PqIndex.encode]]), so
    * at scale this is partition pruning to the probed cells plus
    * parquet predicate pushdown on the encoded scan (the v22 plan on
    * the encoded frame; PlanSpec gates it). Each shard's SHORTLIST is
    * then a shortlist of FILTERED candidates, and the exact re-rank
    * scores only survivors, so with every cell probed and a
    * corpus-wide shortlist the composed filtered search is EXACT within
    * the filter (ADC only orders; the re-rank scores). Width/depth
    * note: neither the auto probe policy nor the root's `shortlist.CAL`
    * (unfiltered contracts) promise a recall target under a predicate —
    * the filter thins every probed cell, so the filtered true top-k
    * sits DEEPER in each shard's ADC order; size filtered workloads
    * with [[graft.operators.AnnCalibrate.calibrateFilteredShortlist]]
    * and pass the result as `shortlist`.
    */
  def searchFiltered(spark: SparkSession, path: String, shards: Int,
                     fullPrecision: DataFrame, query: Seq[Float], k: Int,
                     nProbe: Int = IvfIndex.NProbeAuto,
                     shortlist: Int = PqIndex.DefaultShortlist,
                     predicate: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    Sharding.verifyShards(path, shards)
    val sl = resolveShardedShortlist(path, nProbe, shortlist)
    val shorts = (0 until shards).map { r =>
      val shardPath = s"$path/shard=$r"
      val enc = PqIndex.loadEncoded(spark, shardPath)
      PqIndex.adcShortlist(spark, predicate.fold(enc)(enc.filter),
        PqIndex.loadModel(spark, shardPath), query, nProbe, sl)
    }.reduce(_ unionAll _)
    val qCol = lit(query.toArray).cast("array<float>")
    shorts.select("vec_id")
      .join(fullPrecision.select(col("vec_id"), col("label"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("label"),
        round(graft.expressions.GraftFunctions.cosine_sim(col("embedding"), qCol), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Resolve the per-shard shortlist for a sharded ROOT: the
    * calibration sentinel reads the root's `shortlist.CAL`, which is
    * honored only at the REQUESTED-nProbe policy it was measured under
    * (per-shard resolved widths differ across shards, so the sidecar
    * records the requested policy value verbatim — unlike the
    * single-index sidecar, which records its one resolved width). A
    * mismatch or an uncalibrated root degrades loudly to the default.
    */
  private[graft] def resolveShardedShortlist(path: String, nProbe: Int,
                                             shortlist: Int): Int =
    if (shortlist == PqIndex.ShortlistCalibrated)
      graft.sources.VectorIndexStore.readShortCal(path) match {
        case Some(cal) if cal.nProbe == nProbe => cal.shortlist
        case Some(cal) =>
          System.err.println(s"[graft] shortlist.CAL at $path was sized " +
            s"under probe policy ${cal.nProbe} but this probe requests " +
            s"$nProbe — its recall promise does not transfer; using the " +
            "default shortlist (recalibrate at the serving policy)")
          PqIndex.DefaultShortlist
        case None => PqIndex.DefaultShortlist
      }
    else PqIndex.resolveShortlist(shortlist)
}

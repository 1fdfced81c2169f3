package graft.operators

import org.apache.spark.sql.SparkSession

/** The SERVING-POINTER home for a streaming-fed sharded index — the
  * Versioned-pointer discipline one level up, applied to the (path,
  * shards) pair itself.
  *
  * Why this exists: every sharded verb pairs a root with an S, and a
  * RESHARD changes both (the new artifact lives at a new root because S
  * is part of the artifact identity). The store-level compositions key
  * that identity into the path (`VectorIndexStore.shardedIvfPath`), so a
  * scheduler follows the (path, shards) pair a reshard returns. A
  * STREAMING sink cannot: it holds its root across micro-batches and
  * restarts, so an external reshard used to mean a loud append failure
  * on the GC'd root — and after a restart, a silently shrunken rebuild
  * (round-15 verdict, "What's wrong #4"). The home closes that hole:
  *
  *   home/SERVING   — one atomic sidecar naming the serving generation
  *                    and its shard count ("gen-<k> <S>");
  *   home/gen-<k>   — the generation directories, each a full sharded
  *                    artifact (shards.META, per-shard lifecycle plane).
  *
  * Writers (the streamed sink, each micro-batch) and maintenance (the
  * growth loop) RESOLVE the pair from the pointer; cutover is one atomic
  * pointer flip inside the old generation's writer lease, so a sink that
  * resolved the old pair either finishes its append before the flip
  * (the replay lease blocks it) or resolves the new pair on its next
  * batch. Restart recovery is pointer-first: a checkpoint restart finds
  * the pointer, enters the append branch, and the per-shard anti-joins
  * absorb redelivery — the shrunken-rebuild class is gone because "no
  * pointer" is the ONLY state that builds.
  *
  * The growth loop here uses the CATCH-UP reshard
  * ([[ShardedIvf.reshardCatchUpBuild]] / `reshardCatchUpReplay`), so the
  * corpus-sized rebuild holds NO lease and ingest blocks only for the
  * delta replay + pointer flip + GC — the bounded-stall protocol a
  * streaming-fed index needs (the store-level `reshardShardedIvf` keeps
  * the full-lease variant for scheduled offline maintenance).
  */
object ShardedHome {

  /** The generation a fresh home's first build publishes. */
  val InitialGen = "gen-1"

  private def servingFile(home: String) = s"$home/SERVING"

  private def genSeq(dirName: String): Int =
    "gen-(\\d+)".r.findFirstMatchIn(dirName).map(_.group(1).toInt).getOrElse(0)

  /** The serving (absolute path, shards) pair, when the home has one. */
  def serving(home: String): Option[(String, Int)] =
    graft.sources.Versioned.metaBackend.readString(servingFile(home))
      .flatMap { s =>
        s.trim.split("\\s+") match {
          case Array(d, n) => n.toIntOption.map(i => (s"$home/$d", i))
          case _ => None
        }
      }

  /** Atomically flip the pointer to (`dirName`, `shards`). */
  def publishServing(home: String, dirName: String, shards: Int): Unit =
    graft.sources.Versioned.metaBackend.writeAtomic(
      servingFile(home), s"$dirName $shards")

  /** KEEP-PREVIOUS generation GC, run at each cutover: delete every
    * generation STRICTLY OLDER than the one being retired — the
    * generation the flip retires is RETAINED until the next reshard.
    * Probes are lease-free by design, so a cross-process reader that
    * resolved the old (path, S) pair just before the flip must keep its
    * files mid-plan; this is the store-level [[graft.sources.Versioned]]
    * keep-previous discipline applied to the home's generation axis
    * (round-18; the immediate delete it replaces could yank a prober's
    * files). Cost: one retired generation's storage until the next
    * reshard — or until [[gcRetired]].
    */
  private def gcBelow(home: String, retiring: String): Unit = {
    val cutoff = genSeq(retiring.split('/').last)
    graft.sources.Versioned.metaBackend.list(home)
      .filter(e => e.isDir && genSeq(e.name) > 0 && genSeq(e.name) < cutoff)
      .foreach(e => graft.sources.Versioned.metaBackend
        .deleteRecursively(s"$home/${e.name}"))
  }

  /** EXPLICIT GC of every non-serving generation — the operator verb
    * that reclaims the keep-previous grace storage early. Safe only
    * when no prober can still hold a pre-flip (path, S) pair (probes
    * are bounded jobs; any scheduling gap after the flip suffices).
    * Returns the deleted generation names.
    */
  def gcRetired(home: String): Seq[String] = {
    val cur = serving(home).map(_._1.split('/').last).getOrElse(
      throw new IllegalStateException(s"no SERVING pointer at $home"))
    val stale = graft.sources.Versioned.metaBackend.list(home)
      .filter(e => e.isDir && genSeq(e.name) > 0 && e.name != cur)
      .map(_.name)
    stale.foreach(nm => graft.sources.Versioned.metaBackend
      .deleteRecursively(s"$home/$nm"))
    stale
  }

  /** The growth loop AT A HOME — [[graft.sources.VectorIndexStore.reshardShardedIvfIfNeeded]]
    * re-expressed over the pointer, with the catch-up protocol: judge
    * mean per-shard LIVE rows against `maxShardRows` — counted as
    * physical parquet footer counts MINUS the tombstone sidecar's id
    * count (each metadata-cheap / sidecar-sized; the LOGICAL count via
    * the anti-joined view would be a tombstone broadcast join per shard
    * per micro-batch — a real tax on a 1-second-batch sink). Stale
    * sidecar ids (deletes of never-present rows) make this conservative:
    * it can only UNDER-count live rows, delaying the reshard by at most
    * the stale fraction, never triggering a spurious one — and the next
    * compact clears them. Over the line, rebuild
    * at S′ = ceil(total / maxShardRows) into the next generation
    * directory WITHOUT the old generation's lease (appends keep
    * landing), then — under that lease, the only blocked window —
    * replay the landed delta, flip the pointer, and run the
    * KEEP-PREVIOUS GC ([[gcBelow]]): the retired generation is RETAINED
    * until the next reshard (or an explicit [[gcRetired]]) so a
    * lease-free prober that resolved the old (path, S) pair just before
    * the flip keeps its files mid-plan; only generations two or more
    * flips old are deleted. Crash notes: a crash before the flip leaves
    * the old generation serving and a stale next-gen directory (the
    * retry's build treats it as an in-place rebuild — POSIX homes only,
    * the documented direct-build contract); a crash after the flip
    * leaves at worst an extra retired generation the next flip (or
    * [[gcRetired]]) reclaims.
    * Returns the serving (path, shards) pair either way, so a sink's
    * maintenance step calls it unconditionally and follows the pointer.
    */
  def reshardIfNeeded(spark: SparkSession, home: String,
                      maxShardRows: Long =
                        graft.sources.VectorIndexStore.DefaultMaxShardRows)
      : (String, Int) = {
    require(maxShardRows >= 1, s"maxShardRows=$maxShardRows")
    val (cur, s) = serving(home).getOrElse(throw new IllegalStateException(
      s"no SERVING pointer at $home — nothing to reshard (the first " +
        "streamed batch publishes it)"))
    val total = (0 until s).map { r =>
      val shardPath = s"$cur/shard=$r"
      // physical footer count minus sidecar ids — see the growth-check
      // note above (NOT the logical view: its tombstone anti-join would
      // cost a broadcast join per shard on every micro-batch)
      val physical = IvfIndex.loadVectorsRaw(spark, shardPath).count()
      val deleted = graft.sources.Tombstones.read(spark, shardPath)
        .map(_.distinct().count()).getOrElse(0L)
      math.max(0L, physical - deleted)
    }.sum
    // the >= total short-circuit also keeps the product from overflowing
    // under a no-op sentinel like Long.MaxValue
    if (maxShardRows >= total || total <= maxShardRows * s) (cur, s)
    else {
      val newShards = ((total + maxShardRows - 1) / maxShardRows).toInt
      val newName = s"gen-${genSeq(cur.split('/').last) + 1}"
      val newDir = s"$home/$newName"
      // phase 1 — no lease: ingest flows for the corpus-sized rebuild
      ShardedIvf.reshardCatchUpBuild(spark, cur, s, newDir, newShards)
      // phase 2 — the bounded stall: replay, flip, keep-previous GC
      // under one lease (the retired generation survives until the NEXT
      // reshard so a lease-free prober holding the pre-flip pair keeps
      // its files; [[gcRetired]] reclaims it early)
      graft.sources.Versioned.withWriterLease(cur) {
        ShardedIvf.reshardCatchUpReplay(spark, cur, s, newDir, newShards)
        publishServing(home, newName, newShards)
        gcBelow(home, cur)
      }
      (newDir, newShards)
    }
  }

  /** [[reshardIfNeeded]] for an ENCODED home — the growth loop of
    * [[graft.streaming.StreamingOps.arrivalShardedPqIngest]]. Same
    * live-row judgment (physical encoded footer counts minus
    * sidecar-sized tombstone counts); over the line the rebuild
    * RE-ENCODES at S′ from the cold full-precision store
    * ([[graft.sources.FpStore]]) scoped to the serving generation's
    * LOGICAL membership — PQ shards hold one-byte codes, so the
    * artifact-sourced catch-up of the IVF loop does not apply (decoding
    * codes would bake quantization error into the new artifact), and
    * the membership semi-join is what keeps deletion truth SINGLE: ids
    * the serving index no longer holds (tombstoned or compacted away)
    * fall out of the rebuild, so the new generation is born clean with
    * no tombstone forwarding at all.
    *
    * Bounded-stall like the IVF loop ([[ShardedPq.reshardCatchUpBuild]] /
    * `reshardCatchUpReplay`): the corpus-sized re-encode holds NO lease
    * (external appenders keep landing on the old generation — the
    * calling sink's own loop is serial either way), and the old lease is
    * taken only for the replay of the landed delta + the pointer flip +
    * the GC. The encoded protocol needs no journal: delta discovery is
    * id-column anti-joins over the ~32×-narrower code tables — already
    * the cheap shape the IVF append log exists to reach — and the
    * delete axis reconciles by the same reverse delta, so a mid-window
    * compact cannot resurrect a takedown here either.
    */
  def reshardPqIfNeeded(spark: SparkSession, home: String, fpPath: String,
                        maxShardRows: Long =
                          graft.sources.VectorIndexStore.DefaultMaxShardRows)
      : (String, Int) = {
    require(maxShardRows >= 1, s"maxShardRows=$maxShardRows")
    val (cur, s) = serving(home).getOrElse(throw new IllegalStateException(
      s"no SERVING pointer at $home — nothing to reshard (the first " +
        "streamed batch publishes it)"))
    val total = (0 until s).map { r =>
      val shardPath = s"$cur/shard=$r"
      val physical = PqIndex.loadEncodedRaw(spark, shardPath).count()
      val deleted = graft.sources.Tombstones.read(spark, shardPath)
        .map(_.distinct().count()).getOrElse(0L)
      math.max(0L, physical - deleted)
    }.sum
    if (maxShardRows >= total || total <= maxShardRows * s) (cur, s)
    else {
      val newShards = ((total + maxShardRows - 1) / maxShardRows).toInt
      val newName = s"gen-${genSeq(cur.split('/').last) + 1}"
      val newDir = s"$home/$newName"
      // phase 1 — no lease: external appends flow for the re-encode
      ShardedPq.reshardCatchUpBuild(spark, cur, s, newDir, newShards, fpPath)
      // phase 2 — the bounded stall: replay both axes, flip,
      // keep-previous GC (see [[gcBelow]] — probers keep the old pair)
      graft.sources.Versioned.withWriterLease(cur) {
        ShardedPq.reshardCatchUpReplay(spark, cur, s, newDir, newShards, fpPath)
        publishServing(home, newName, newShards)
        gcBelow(home, cur)
      }
      (newDir, newShards)
    }
  }
}

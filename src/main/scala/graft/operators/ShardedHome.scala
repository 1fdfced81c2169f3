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

  /** The growth loop AT A HOME — [[graft.sources.VectorIndexStore.reshardShardedIvfIfNeeded]]
    * re-expressed over the pointer, with the catch-up protocol: judge
    * mean per-shard rows against `maxShardRows` (S parquet footer
    * counts — metadata reads, no corpus scan); over the line, rebuild
    * at S′ = ceil(total / maxShardRows) into the next generation
    * directory WITHOUT the old generation's lease (appends keep
    * landing), then — under that lease, the only blocked window —
    * replay the landed delta, flip the pointer, and GC the old
    * generation. Crash notes: a crash before the flip leaves the old
    * generation serving and a stale next-gen directory (the retry's
    * build treats it as an in-place rebuild — POSIX homes only, the
    * documented direct-build contract); a crash after the flip leaves
    * at worst an unreferenced old generation for the operator to GC.
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
      IvfIndex.loadVectors(spark, s"$cur/shard=$r").count()
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
      // phase 2 — the bounded stall: replay, flip, GC under one lease
      graft.sources.Versioned.withWriterLease(cur) {
        ShardedIvf.reshardCatchUpReplay(spark, cur, s, newDir, newShards)
        publishServing(home, newName, newShards)
        graft.sources.Versioned.metaBackend.deleteRecursively(cur)
      }
      (newDir, newShards)
    }
  }
}

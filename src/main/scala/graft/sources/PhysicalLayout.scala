package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout levers that pay off at cluster scale: sort-on-write for
  * parquet min/max row-group pruning (the z-order-lite for one dimension).
  *
  * A parquet scan prunes a row group when the pushed-down predicate falls
  * outside the group's column min/max statistics. Random writes give every
  * group the full value range (nothing prunes); range-partitioned sorted
  * writes give disjoint tight ranges, so a selective range predicate reads
  * only the few groups it overlaps. At 100 TB this is the difference
  * between scanning a table and scanning a slice — same query, same plan
  * shape, 10-100x less IO (asserted behaviorally in PhysicalLayoutSpec via
  * scan-node numOutputRows on sorted vs unsorted copies).
  *
  * Storage scope: [[ensureDir]]/[[sourceTag]] manage LOCAL derived caches
  * of the test fixtures (driver-local by construction — the publication
  * protocol relies on POSIX directory rename) and deliberately stay on
  * `java.io`. Durable artifact metadata goes through [[MetaBackend]]; this
  * helper is the fixture cache, not the artifact layer.
  */
object PhysicalLayout {

  /** Production row-group size (the parquet default): large groups amortize
    * footer/stat overhead and match the 128 MiB split size a cluster scan
    * wants. This is the DEFAULT for every artifact write.
    */
  val ProductionBlockSize = 128 * 1024 * 1024

  /** Test-only override: row groups small enough that multi-group pruning
    * is OBSERVABLE at test SFs (a 64 KiB group holds ~2k posting rows, so
    * the fixture artifact spans several groups). Passed explicitly at
    * test/demo call sites — never a production default.
    */
  val TestBlockSize = 64 * 1024

  /** Write `df` range-partitioned and sorted by `sortCol` — every output
    * file covers a disjoint range, every row group a tight sub-range.
    * Page size scales with the block size (a 128 MiB group with 16 KiB
    * pages would fragment the column chunks; a 64 KiB test group needs
    * sub-group pages for page-level pruning to be visible).
    */
  def writeSorted(df: DataFrame, sortCol: String, path: String,
                  partitions: Int = 4, blockSize: Int = ProductionBlockSize): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize)
      .option("parquet.page.size", math.max(16 * 1024, blockSize / 128))
      .parquet(path)

  /** Short fingerprint of a fixture table file (length + mtime), for
    * embedding in derived-cache paths: a regenerated fixture (same path,
    * new content) then misses the cache instead of silently serving stale
    * derived data.
    */
  def sourceTag(sfDir: String, table: String): String = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    java.lang.Long.toHexString(f.length * 31 + f.lastModified)
  }

  /** Idempotent sorted copy: first caller pays the write (of whatever
    * `build` produces), later queries in the same run reuse it.
    *
    * NOTE: sort on a parquet-pushdown-capable column type. The fixture's
    * naive timestamps load as TIMESTAMP_NTZ, which Spark 4.1's parquet
    * filter pushdown does NOT support (measured: zero row groups pruned on
    * an NTZ sort column, any literal type) — day-granular timestamps
    * should be cast to DATE before the sorted write.
    */
  def ensureSortedCopy(path: String, sortCol: String,
                       blockSize: Int = ProductionBlockSize)(build: => DataFrame): Unit =
    ensureDir(path)(p => writeSorted(build, sortCol, p, blockSize = blockSize))

  /** Idempotent, concurrency-safe materialization of a directory-shaped
    * artifact: the writer produces into a unique temp sibling, then one
    * atomic rename publishes it. A bare exists-then-overwrite guard races
    * between concurrent Verify/Bench JVMs (both see a cold cache, both
    * overwrite the SAME directory, one reads a half-deleted mix); with the
    * rename protocol the loser just deletes its temp and reads the
    * winner's complete copy.
    */
  def ensureDir(path: String)(write: String => Unit): Unit = {
    val target = new java.io.File(path)
    if (new java.io.File(target, "_SUCCESS").exists()) return
    val tmp = new java.io.File(
      path + ".tmp-" + ProcessHandle.current().pid() + "-" + System.nanoTime())
    write(tmp.getPath)
    Option(target.getParentFile).foreach(_.mkdirs())
    if (!tmp.renameTo(target)) {
      // another process published first (rename onto an existing non-empty
      // directory fails): discard ours, use theirs — but never proceed
      // without SOME complete copy
      import scala.reflect.io.Directory
      new Directory(tmp).deleteRecursively()
      if (!new java.io.File(target, "_SUCCESS").exists())
        throw new IllegalStateException(
          s"could not publish $path and no complete copy exists")
    }
  }
}

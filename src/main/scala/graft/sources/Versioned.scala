package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Two-phase pointer-file publication for derived tables inside an
  * artifact directory — the crash- and reader-safe replacement for
  * delete-then-rename swaps (round-6's refresh left a window where a
  * reader between the delete and the rename saw a MISSING table, and a
  * crash between a base-table append and the derived refresh left the
  * derived table silently stale).
  *
  * Protocol (no transactional table format needed):
  *   1. write the new version into a fresh sibling directory
  *      `<name>-v<n>-<pid>-<nano>` (never touches the current one);
  *   2. atomically flip the pointer file `<name>.CURRENT` (tmp file +
  *      `ATOMIC_MOVE`) to the new directory, stamping a WATERMARK — the
  *      base-table row count the version was derived from;
  *   3. garbage-collect versions older than the immediately previous one
  *      (kept for readers that resolved the pointer just before the flip).
  *
  * Reader guarantees:
  *   - a reader concurrent with a refresh sees either the old or the new
  *     version, both complete — never a missing or half-written table;
  *   - a reader can compare the pointer's watermark against the base
  *     table's current row count (parquet footer metadata — no data scan)
  *     and DETECT a stale derived table (crash-after-append), triggering
  *     repair instead of serving wrong aggregates.
  *
  * Writer contract: SINGLE WRITER per artifact (the standard contract for
  * segmented-index maintenance — concurrent appenders would both anti-join
  * against the same base snapshot and double-insert regardless of this
  * protocol). Readers are unrestricted. ENFORCED by [[withWriterLease]]
  * (create-exclusive lease file, loud [[ConcurrentWriterException]] on
  * contention, expiry-based takeover after a crash), acquired by every
  * store append/compact entry point. Asserted in ArtifactStoresSpec
  * (concurrent-writer, reader-during-refresh, crash-recovery tests).
  */
object Versioned {

  final case class Current(dir: String, watermark: Long)

  /** Thrown on writer-lease contention — the single-writer contract made
    * LOUD. Before round 8 the contract was documentation only: two
    * concurrent appenders would each anti-join against the same base
    * snapshot and double-insert, corrupting the store silently.
    */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** Default lease time-to-live. A crashed writer's lease is takeover-able
    * after this long; a HEALTHY long-running writer renews every ttl/3 (the
    * heartbeat), so the TTL bounds only (a) how long a crashed writer
    * blocks other writers and (b) how long a checked reader may tolerate a
    * crashed writer's stale derived table — both want a SHORT ttl, and the
    * heartbeat removes the old reason for a long one (jobs that outlive
    * it). 5 min still tolerates extreme GC/IO stalls between heartbeats.
    */
  val LeaseTtlMs: Long = 5 * 60 * 1000L

  // In-JVM guard: one ReentrantLock per canonical artifact path. Two
  // threads of the same process contend HERE (the lease file alone cannot
  // arbitrate them — both would read their own pid); cross-process writers
  // contend on the create-exclusive lease file below. The map only ever
  // holds paths this JVM has written — bounded by the artifact count.
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]

  private def leaseFile(canonical: String) =
    new java.io.File(canonical, "WRITER.LEASE")

  /** Run `body` holding the EXCLUSIVE writer lease for the artifact at
    * `path` — acquired by every store append/compact/refresh entry point.
    *
    * Protocol: create-exclusive lease file `WRITER.LEASE` containing
    * `<pid> <expiryEpochMs>`. Contention fails LOUDLY with
    * [[ConcurrentWriterException]] (never blocks, never corrupts); an
    * EXPIRED lease (crashed writer) is taken over — the takeover itself is
    * race-safe because the loser of the re-create throws. Re-entrant
    * within a thread (compact internally publishes; nested acquisition of
    * the same artifact is one lease).
    */
  def withWriterLease[T](path: String, ttlMs: Long = LeaseTtlMs)(body: => T): T = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val canonical = dir.getCanonicalPath
    val lock = jvmLocks.computeIfAbsent(canonical,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (lock.isHeldByCurrentThread) { lock.lock(); try body finally lock.unlock() }
    else {
      if (!lock.tryLock())
        throw new ConcurrentWriterException(
          s"artifact $canonical already has an active writer in this process " +
            "(Versioned single-writer contract): serialize maintenance calls")
      try {
        acquireFileLease(canonical, ttlMs)
        // HEARTBEAT: a healthy writer renews its expiry every ttl/3, so a
        // maintenance job that legitimately outlives the TTL (a retrain is
        // an hours-long rebuild at scale) is never taken over mid-write —
        // expiry-based takeover remains strictly a crashed-writer path.
        // Renewal is an atomic replace (tmp + ATOMIC_MOVE): a concurrent
        // contender never sees a torn lease it would misread as expired.
        // Every tick's file mutation runs under `tickLock`, and release
        // sets the flag under the SAME lock before deleting — so an
        // in-flight renewal either completes before the delete (and its
        // write is removed by it) or observes the flag and does nothing.
        // No straggler can resurrect a released lease or clobber a
        // successor's.
        val released = new java.util.concurrent.atomic.AtomicBoolean(false)
        val tickLock = new Object
        val period = math.max(50L, ttlMs / 3)
        val renewal = renewScheduler.scheduleAtFixedRate(
          () => tickLock.synchronized {
            if (!released.get()) renewLease(canonical, ttlMs)
          },
          period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
        try body finally {
          tickLock.synchronized { released.set(true) }
          renewal.cancel(false)
          releaseFileLease(canonical)
        }
      } finally lock.unlock()
    }
  }

  // ONE shared daemon scheduler for every lease heartbeat in the process —
  // per-acquisition executors would create and tear down a thread for every
  // sub-second store append in a streaming sink
  private lazy val renewScheduler: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-renew")
        t.setDaemon(true)
        t
      })

  private def renewLease(canonical: String, ttlMs: Long): Unit =
    try {
      val content =
        s"${ProcessHandle.current().pid()} ${System.currentTimeMillis() + ttlMs}"
      val tmp = new java.io.File(canonical, s"WRITER.LEASE.tmp-${System.nanoTime()}")
      java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp.toPath, leaseFile(canonical).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: Exception => () } // next tick retries; expiry has slack

  private def acquireFileLease(canonical: String, ttlMs: Long): Unit = {
    val f = leaseFile(canonical)
    val content = s"${ProcessHandle.current().pid()} ${System.currentTimeMillis() + ttlMs}"
    try
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val (pid, expiry) =
          try {
            val Array(p, e) =
              java.nio.file.Files.readString(f.toPath).trim.split(" ")
            (p.toLong, e.toLong)
          } catch { // unreadable/torn lease: treat as expired
            case _: Exception => (-1L, 0L)
          }
        val self = ProcessHandle.current().pid()
        // an unexpired foreign lease is an ACTIVE writer; our own pid here
        // means a crashed-and-restarted maintenance thread of this very
        // process (the JVM lock was free) — both stale cases take over
        if (expiry >= System.currentTimeMillis() && pid != self)
          throw new ConcurrentWriterException(
            s"artifact $canonical has an active writer lease (pid $pid, " +
              s"expires ${new java.util.Date(expiry)}): Versioned " +
              "single-writer contract — a second concurrent appender would " +
              "double-insert against the same base snapshot")
        java.nio.file.Files.deleteIfExists(f.toPath)
        // the loser of a takeover race hits CREATE_NEW failure and throws
        try
          java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new ConcurrentWriterException(
              s"artifact $canonical: lost the takeover race for an expired " +
                "writer lease to another process")
        }
    }
  }

  private def releaseFileLease(canonical: String): Unit =
    java.nio.file.Files.deleteIfExists(leaseFile(canonical).toPath)

  private def pointerFile(path: String, name: String) =
    new java.io.File(path, s"$name.CURRENT")

  /** Version number encoded in a version-directory name. */
  private def versionOf(dir: String): Long = {
    val tail = dir.substring(dir.lastIndexOf("-v") + 2)
    val end = tail.indexOf('-')
    (if (end < 0) tail else tail.substring(0, end)).toLong
  }

  /** Resolve the current version of derived table `name`, if published. */
  def readPointer(path: String, name: String): Option[Current] = {
    val f = pointerFile(path, name)
    if (!f.exists()) None
    else {
      val Array(dir, wm) = java.nio.file.Files.readString(f.toPath).trim.split(" ")
      Some(Current(dir, wm.toLong))
    }
  }

  /** The current version of `name` as a DataFrame (fails loudly when no
    * version was ever published — an incomplete artifact, not an empty
    * table).
    */
  def read(spark: SparkSession, path: String, name: String): DataFrame = {
    val cur = readPointer(path, name).getOrElse(throw new IllegalStateException(
      s"derived table $name has no published version at $path"))
    spark.read.parquet(s"$path/${cur.dir}")
  }

  /** Publish a new version of `name`: `write` produces into a fresh
    * version directory, then one atomic pointer flip makes it current with
    * `watermark` recorded. A crash mid-`write` leaves an orphan directory
    * the next publication GCs — the pointer never references an incomplete
    * version.
    */
  def publish(path: String, name: String, watermark: Long)
             (write: String => Unit): Unit = {
    val prev = readPointer(path, name)
    val n = prev.map(c => versionOf(c.dir) + 1).getOrElse(1L)
    val dir = s"$name-v$n-${ProcessHandle.current().pid()}-${System.nanoTime()}"
    write(s"$path/$dir")
    val tmp = new java.io.File(path, s"$name.CURRENT.tmp-${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp.toPath, s"$dir $watermark")
    java.nio.file.Files.move(tmp.toPath, pointerFile(path, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // GC anything older than the version that was current just before the
    // flip: a reader holding THAT version finishes unharmed; anything older
    // (including orphans of crashed publications) has no live readers
    prev.foreach { c =>
      val cutoff = versionOf(c.dir)
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(s"$name-v") &&
          f.getName != c.dir && f.getName != dir &&
          versionOf(f.getName) < cutoff)
        .foreach { f =>
          import scala.reflect.io.Directory
          new Directory(f).deleteRecursively()
        }
    }
  }
}

package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** In-memory OBJECT STORE with native object-store semantics — the third
  * [[MetaBackend]] storage class, completing the matrix the trait scaladoc
  * promises ("a native object-store backend needs no rename — one
  * overwrite PUT per pointer"):
  *
  *   - a bucket is a FLAT namespace of `key -> bytes` objects; there are
  *     no directories, only key prefixes (an explicit zero-byte
  *     "directory marker" set stands in for `mkdirs`, exactly as S3
  *     console folders do);
  *   - PUT overwrites a whole object atomically, last writer wins — no
  *     tmp file, no rename, no append (the backend has neither);
  *   - LIST is a prefix scan with `/` as delimiter: direct keys list as
  *     files, deeper keys surface their first path segment as a
  *     "common prefix" (a directory entry);
  *   - DELETE removes objects by key or by prefix sweep (batch delete).
  *
  * Two consumers share one bucket per authority:
  *
  *   - [[ObjectStoreMetaBackend]] — the metadata plane over PUT/GET/LIST/
  *     DELETE only. Its `writeAtomic` is ONE PUT: the rename-free pointer
  *     flip the design doc describes. Mirrors the lease layer's
  *     round-10 `InMemoryCasLeaseBackend` move: same drill matrix, third
  *     storage class.
  *   - [[MemFileSystem]] — a minimal Hadoop `FileSystem` (`mem://bucket/
  *     key`) over the SAME bucket, so Spark's parquet data plane and the
  *     meta plane share a namespace the way a real `s3a://bucket`
  *     deployment's do. This lets the FULL `Versioned`
  *     publish/GC/read-back lifecycle (parquet write + pointer flip +
  *     version GC + `RowCountCache` fingerprint) run against object-store
  *     semantics end-to-end in MetaBackendSpec, not just the primitive
  *     matrix. Data-plane rename IS supported here (committers rename;
  *     that is the committer's concern, cf. S3A committers) — the META
  *     backend never calls it.
  *
  * In-memory by construction: a conformance/drill backend (single-JVM,
  * like `InMemoryCasLeaseBackend`), not a production store. A real
  * object-store port implements the same five calls against the store's
  * SDK; every primitive here was chosen to be exactly one such request.
  */
object MemObjectStore {

  /** One bucket: flat object map (key -> (bytes, mtime)) + explicit
    * directory markers (keys without trailing slash; "" is the root).
    */
  final class Bucket {
    val objects = new ConcurrentHashMap[String, (Array[Byte], Long)]()
    val dirMarkers: java.util.Set[String] =
      ConcurrentHashMap.newKeySet[String]()
    dirMarkers.add("") // the bucket root always exists

    def put(key: String, bytes: Array[Byte]): Unit = {
      objects.put(key, (bytes, System.currentTimeMillis())) // ONE atomic PUT
      ()
    }
    def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
      objects.putIfAbsent(key, (bytes, System.currentTimeMillis())) == null
    def get(key: String): Option[Array[Byte]] =
      Option(objects.get(key)).map(_._1)
    def mtime(key: String): Long =
      Option(objects.get(key)).map(_._2).getOrElse(0L)
    def mkdir(key: String): Unit = {
      // ancestors too, so a marker-created tree lists top-down
      var k = norm(key)
      while (k.nonEmpty) { dirMarkers.add(k); k = parentOf(k) }
    }

    /** Key exists as an object, a marker, or a non-empty prefix. */
    def exists(key: String): Boolean = {
      val k = norm(key)
      k.isEmpty || objects.containsKey(k) || dirMarkers.contains(k) ||
        hasPrefix(k + "/")
    }
    def isDir(key: String): Boolean = {
      val k = norm(key)
      k.isEmpty || ((dirMarkers.contains(k) || hasPrefix(k + "/")) &&
        !objects.containsKey(k))
    }
    private def hasPrefix(p: String): Boolean = {
      val oit = objects.keySet().iterator()
      while (oit.hasNext) if (oit.next().startsWith(p)) return true
      val dit = dirMarkers.iterator()
      while (dit.hasNext) if (dit.next().startsWith(p)) return true
      false
    }

    /** Delimiter LIST: direct children of `key` — (name, size, isDir).
      * Deeper objects surface their first segment as a common prefix.
      */
    def list(key: String): Seq[(String, Long, Boolean)] = {
      val k = norm(key)
      val prefix = if (k.isEmpty) "" else k + "/"
      val files = scala.collection.mutable.Map.empty[String, Long]
      val subdirs = scala.collection.mutable.Set.empty[String]
      objects.forEach { (ok, v) =>
        if (ok.startsWith(prefix) && ok.length > prefix.length) {
          val rest = ok.substring(prefix.length)
          val slash = rest.indexOf('/')
          if (slash < 0) files(rest) = v._1.length.toLong
          else subdirs += rest.substring(0, slash)
        }
      }
      dirMarkers.forEach { dk =>
        if (dk.startsWith(prefix) && dk.length > prefix.length) {
          val rest = dk.substring(prefix.length)
          val slash = rest.indexOf('/')
          subdirs += (if (slash < 0) rest else rest.substring(0, slash))
        }
      }
      (files.map { case (n, s) => (n, s, false) } ++
        subdirs.filterNot(files.contains).map(n => (n, 0L, true))).toSeq
    }

    /** Batch DELETE of the key and everything under it. */
    def deletePrefix(key: String): Unit = {
      val k = norm(key)
      objects.remove(k)
      dirMarkers.remove(k)
      val p = k + "/"
      objects.keySet().removeIf(_.startsWith(p))
      dirMarkers.removeIf(_.startsWith(p))
      ()
    }

    def norm(key: String): String =
      key.split('/').filter(_.nonEmpty).mkString("/")
    def parentOf(key: String): String = {
      val i = key.lastIndexOf('/')
      if (i < 0) "" else key.substring(0, i)
    }
  }

  private val buckets = new ConcurrentHashMap[String, Bucket]()

  def bucket(name: String): Bucket =
    buckets.computeIfAbsent(name, _ => new Bucket)

  /** Drop a bucket (test isolation between spec runs). */
  def dropBucket(name: String): Unit = { buckets.remove(name); () }

  /** `mem://bucket/key...` -> (bucket, key). Plain paths are rejected —
    * an object store has no local filesystem to fall back to.
    */
  def parse(path: String): (Bucket, String) = {
    require(path.startsWith("mem://"),
      s"MemObjectStore paths are mem://bucket/key URIs, got: $path")
    val rest = path.stripPrefix("mem://")
    val slash = rest.indexOf('/')
    val (b, k) = if (slash < 0) (rest, "") else rest.splitAt(slash)
    val bkt = bucket(b)
    (bkt, bkt.norm(k))
  }
}

/** The metadata plane over native object-store primitives ONLY — the
  * implementation the [[MetaBackend]] scaladoc's design paragraph
  * describes. Each trait call is exactly one object-store request:
  *
  *   - `writeAtomic` = ONE overwrite PUT. Atomic because a whole object
  *     is; no tmp sibling, no rename (this backend HAS no rename). The
  *     pointer-flip cost on a real store is one PUT per publication —
  *     versus HadoopMetaBackend-on-S3A's copy+delete rename.
  *   - `createMarker` = PUT-if-absent of an empty object (idempotent:
  *     losing the race to another completer of the same build is success).
  *   - `readString`/`exists` = GET/HEAD. Absence is None/false; there is
  *     no "IO error reads as absence" failure mode to guard — but the
  *     contract stands for real SDK ports: only 404 maps to None.
  *   - `list` = LIST with prefix + `/` delimiter.
  *   - `deleteRecursively` = batch DELETE by prefix.
  *
  * No compare-and-swap anywhere, by design: meta-plane writers already
  * run under the writer lease ([[Versioned.withWriterLease]]); the lease
  * plane is where conditional writes live ([[LeaseBackend]]).
  */
object ObjectStoreMetaBackend extends MetaBackend {
  import MemObjectStore.parse

  override def readString(path: String): Option[String] = {
    val (b, k) = parse(path)
    b.get(k).map(new String(_, "UTF-8"))
  }

  override def writeAtomic(path: String, content: String): Unit = {
    val (b, k) = parse(path)
    b.put(k, content.getBytes("UTF-8")) // the single-PUT pointer flip
  }

  override def createMarker(path: String): Unit = {
    val (b, k) = parse(path)
    b.putIfAbsent(k, Array.emptyByteArray)
    require(b.exists(k), s"could not create completeness marker $path")
  }

  override def exists(path: String): Boolean = {
    val (b, k) = parse(path)
    b.exists(k)
  }

  override def list(dir: String): Seq[MetaBackend.Entry] = {
    val (b, k) = parse(dir)
    b.list(k).map { case (n, s, d) => MetaBackend.Entry(n, s, d) }
  }

  override def deleteRecursively(path: String): Unit = {
    val (b, k) = parse(path)
    b.deletePrefix(k)
  }
}

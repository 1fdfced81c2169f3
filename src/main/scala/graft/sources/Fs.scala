package graft.sources

import org.apache.spark.sql.SparkSession

/** Filesystem existence probe through the Hadoop FileSystem API, so
  * store-presence checks work on ANY filesystem Spark can read
  * (hdfs://, s3a://, file:) — `java.io.File.exists` silently answers
  * false for every remote URI, which turns an "absent store, bootstrap"
  * branch into a correctness bug off the local filesystem (re-appending
  * rows the store already holds). Data-plane probes route through here;
  * the lease/pointer control plane stays on [[LeaseBackend]]'s documented
  * storage-class backends.
  */
object Fs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Recursive delete through the same API (no-op when absent) — the
    * data-plane counterpart of [[exists]] for sidecar/GC removal. A
    * `java.io`-based delete would silently leave every remote sidecar in
    * place, turning "tombstones applied and cleared" into "tombstones
    * applied forever" off the local filesystem.
    */
  def deleteRecursively(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}

package graft.text

import graft.operators.Ingest
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Golden-fixture generator for GoldenChunksSpec. Run ONLY on an intentional
  * splitter-semantics change:
  *
  *   sbt "Test/runMain graft.text.GoldenChunksGen"
  *
  * Rewrites the checked-in chunker digests for sf0.01 and sf0.1.
  */
object GoldenChunksGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((sf, suffix) <- Seq("sf0.01" -> "sf001", "sf0.1" -> "sf01")) {
      val docs = Tables.load(spark, s"/root/testdata/$sf", "documents")
      Ingest.chunkDocuments(spark, docs).toDF()
        .select(col("id"), col("filename"), col("chunk_id"), col("text_hash"),
          length(col("content")).as("n_chars"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(s"src/test/resources/golden/chunk_digest_$suffix")
      println(s"[golden] wrote chunk_digest_$suffix")
    }
    spark.stop()
  }
}

package graft.text

import graft.SparkTestBase
import graft.operators.Ingest
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Splitter drift gate: the recursive character chunker's output over the
  * sf0.01 corpus, digested to (id, filename, chunk_id, text_hash = md5 of
  * chunk content, n_chars), must match the checked-in golden parquet
  * byte-for-byte. Any change to the splitter — separators, sizes, overlap,
  * merge rules — fails here even though the driver records d08 as
  * rows-only (the chunker is the one nontrivial pure algorithm, A8).
  *
  * Regenerate the golden ONLY for an intentional semantics change:
  * chunkDocuments over sf0.01 → select digest cols → coalesce(1) →
  * parquet to src/test/resources/golden/chunk_digest_sf001.
  */
class GoldenChunksSpec extends SparkTestBase {

  test("chunker digest over sf0.01 matches the checked-in golden parquet") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val actual = Ingest.chunkDocuments(spark, docs).toDF()
      .select(col("id"), col("filename"), col("chunk_id"), col("text_hash"),
        length(col("content")).as("n_chars"))
    val golden = spark.read.parquet(
      "src/test/resources/golden/chunk_digest_sf001")

    assert(actual.count() == golden.count(), "chunk count drifted")
    val missing = golden.except(actual).count()
    val extra = actual.except(golden).count()
    assert(missing == 0 && extra == 0,
      s"splitter drift: $missing golden rows missing, $extra unexpected rows")
  }
}

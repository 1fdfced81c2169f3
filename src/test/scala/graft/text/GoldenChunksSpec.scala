package graft.text

import graft.SparkTestBase
import graft.operators.Ingest
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Splitter drift gate: the recursive character chunker's output over the
  * sf0.01 corpus, digested to (id, filename, chunk_id, text_hash = md5 of
  * chunk content, n_chars), must match the checked-in golden parquet
  * byte-for-byte. Any change to the splitter — separators, sizes, overlap,
  * merge rules — fails here at full row granularity (the driver's d08
  * gate is a golden-VALUES corpus digest; the chunker is the one
  * nontrivial pure algorithm, A8).
  *
  * Regenerate the goldens ONLY for an intentional semantics change:
  * `sbt "Test/runMain graft.text.GoldenChunksGen"` (see GoldenChunksGen).
  *
  * Two SFs: sf0.01 is the driver's correctness SF; sf0.1 is the bench SF —
  * the larger corpus exercises length/separator regimes (longer docs, more
  * merge boundaries) the small one may not, so drift that only manifests at
  * bench scale is still caught.
  */
class GoldenChunksSpec extends SparkTestBase {

  /** One drift check: `actualRaw` (materialized once — the composed
    * pipelines are the suite's most expensive frames and the check reads
    * them three times) must equal the checked-in golden exactly.
    */
  private def driftCheck(label: String, actualRaw: org.apache.spark.sql.DataFrame,
                         goldenDir: String): Unit = {
    val actual = actualRaw.localCheckpoint(true)
    val golden = spark.read.parquet(goldenDir)
    assert(actual.count() == golden.count(), s"$label row count drifted")
    val missing = golden.except(actual).count()
    val extra = actual.except(golden).count()
    assert(missing == 0 && extra == 0,
      s"$label drift: $missing golden rows missing, $extra unexpected rows")
  }

  private def digestDrift(sfDir: String, goldenDir: String): Unit =
    driftCheck("splitter",
      Ingest.chunkDocuments(spark, Tables.load(spark, sfDir, "documents")).toDF()
        .select(col("id"), col("filename"), col("chunk_id"), col("text_hash"),
          length(col("content")).as("n_chars")),
      goldenDir)

  test("chunker digest over sf0.01 matches the checked-in golden parquet") {
    digestDrift("/root/testdata/sf0.01", "src/test/resources/golden/chunk_digest_sf001")
  }

  test("chunker digest over sf0.1 matches the checked-in golden parquet") {
    digestDrift("/root/testdata/sf0.1", "src/test/resources/golden/chunk_digest_sf01")
  }

  /** d10 drift gate: the COMPOSED flagship output (normalize → chunk →
    * hash → dedup → embed → canonical rows, vector as dim+L2 digest),
    * EVERY ROW byte-for-byte. The driver's d10 query now hash-gates a
    * single xor-folded corpus digest of the same rows (golden-VALUES
    * oracle); this golden parquet stays as the byte-level backstop —
    * a digest collision or a row-level regression the fold happens to
    * cancel still fails here. Built directly (not via the registry,
    * whose d10 entry returns the one-row digest).
    */
  private def d10Drift(sfDir: String, goldenDir: String): Unit =
    driftCheck("d10", graft.queries.PipelineQueries.d10Canonical(spark, sfDir),
      goldenDir)

  test("d10 canonical output over sf0.01 matches the checked-in golden parquet") {
    d10Drift("/root/testdata/sf0.01", "src/test/resources/golden/d10_digest_sf001")
  }

  test("d10 canonical output over sf0.1 matches the checked-in golden parquet") {
    d10Drift("/root/testdata/sf0.1", "src/test/resources/golden/d10_digest_sf01")
  }

  /** m06's byte-level backstop — same role as d10's: the driver gate
    * hash-checks a one-row xor digest of these rows; this golden pins
    * every row byte-for-byte, so a digest collision or a fold-cancelling
    * row regression still fails loudly.
    */
  private def m06Drift(sfDir: String, goldenDir: String): Unit =
    driftCheck("m06", graft.queries.MultimodalQueries.m06Canonical(spark, sfDir),
      goldenDir)

  test("m06 binary-ingest output over sf0.01 matches the checked-in golden parquet") {
    m06Drift("/root/testdata/sf0.01", "src/test/resources/golden/m06_digest_sf001")
  }

  test("m06 binary-ingest output over sf0.1 matches the checked-in golden parquet") {
    m06Drift("/root/testdata/sf0.1", "src/test/resources/golden/m06_digest_sf01")
  }
}

package graft.sources

import graft.SparkTestBase
import graft.operators.{HashingEmbedder, Ingest}
import graft.schemas.Schemas
import java.nio.file.Files

/** Source/sink matrix (SURVEY.md §2.B scans row): parquet is primary (every
  * query), binaryFile is covered in MultimodalSpec; CSV and JSON roundtrips
  * + the idempotent chunk-store DDL and batch upsert are covered here.
  */
class SourcesSpec extends SparkTestBase {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("CSV roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/docs"
    docs.write.option("header", "true").csv(dir)
    val back = spark.read.schema(Schemas.documents).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.schema == Schemas.documents)
    // content equality modulo row order (CSV quoting round-trips text)
    assert(back.select("doc_id", "n_chars").exceptAll(docs.select("doc_id", "n_chars")).isEmpty)
  }

  test("JSON roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString + "/docs"
    docs.write.json(dir)
    val back = spark.read.schema(Schemas.documents).json(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "text").exceptAll(docs.select("doc_id", "text")).isEmpty)
  }

  test("chunk store ensure is idempotent and never truncates (A21)") {
    val path = Files.createTempDirectory("graft_store").toString + "/chunks"
    ChunkStore.ensure(spark, path)
    assert(ChunkStore.readPhysical(spark, path).schema.fieldNames.sameElements(Schemas.chunkStore.fieldNames))
    assert(ChunkStore.readPhysical(spark, path).count() == 0)
    // write data, re-ensure, data survives
    val batch = Ingest.pipeline(spark, docs.limit(10), new HashingEmbedder())
    ChunkStore.upsert(spark, batch, path)
    val n = ChunkStore.readPhysical(spark, path).count()
    assert(n > 0)
    ChunkStore.ensure(spark, path)
    assert(ChunkStore.readPhysical(spark, path).count() == n)
  }

  test("partitioned chunk store: hive layout + partition pruning") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft_store_part").toString + "/chunks"
    val batch = Ingest.pipeline(spark, docs.limit(30), new HashingEmbedder())
    ChunkStore.upsert(spark, batch, path, partitionBy = Seq("filename"))
    val back = ChunkStore.readPhysical(spark, path)
    assert(back.count() == batch.count())
    // partition dirs exist and the scan prunes on the partition column
    val one = back.filter(col("filename") === "src0")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(filename"), plan)
    // second identical upsert is a no-op
    ChunkStore.upsert(spark, batch, path, partitionBy = Seq("filename"))
    assert(ChunkStore.readPhysical(spark, path).count() == batch.count())
  }

  test("chunk store delete: immediate logical removal, re-upsert gated, compact applies + clears") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = Files.createTempDirectory("graft_store_del").toString + "/chunks"
    val batch = Ingest.pipeline(spark, docs.limit(20), new HashingEmbedder())
    ChunkStore.upsert(spark, batch, path)
    val n = ChunkStore.readPhysical(spark, path).count()
    val victims = ChunkStore.readPhysical(spark, path).select("text_hash")
      .orderBy("text_hash").limit(3).as[String].collect().toSeq
    ChunkStore.delete(spark, path, victims.toDF("text_hash"))
    val logical = ChunkStore.read(spark, path)
    assert(logical.count() == n - 3, "deleted keys vanish from the logical view immediately")
    assert(logical.filter(col("text_hash").isin(victims: _*)).count() == 0)
    assert(ChunkStore.readPhysical(spark, path).count() == n,
      "the physical table is untouched — delete cost is the sidecar")
    // re-upsert before compact: the key anti-join reads PHYSICAL presence,
    // so the deleted chunk is skipped and stays deleted
    ChunkStore.upsert(spark, batch, path)
    assert(ChunkStore.read(spark, path).count() == n - 3,
      "a deleted key cannot be re-upserted before a compact")
    ChunkStore.compact(spark, path)
    assert(ChunkStore.readPhysical(spark, path).count() == n - 3,
      "compaction applies the tombstones physically")
    assert(Tombstones.read(spark, s"$path.ts").isEmpty, "and clears the sidecar")
    // now the re-upsert lands
    ChunkStore.upsert(spark, batch, path)
    assert(ChunkStore.readPhysical(spark, path).count() == n,
      "after the compact the same upsert re-adds the removed chunks")
  }

  test("chunk store upsert keeps first arrival per hash (A14/A12)") {
    val path = Files.createTempDirectory("graft_store2").toString + "/chunks"
    val batch = Ingest.pipeline(spark, docs.limit(20), new HashingEmbedder())
    ChunkStore.upsert(spark, batch, path)
    val n1 = ChunkStore.readPhysical(spark, path).count()
    ChunkStore.upsert(spark, batch, path) // identical batch → no-op
    val n2 = ChunkStore.readPhysical(spark, path).count()
    assert(n1 == n2)
    val dups = ChunkStore.readPhysical(spark, path).groupBy("text_hash").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(dups == 0)
  }
}

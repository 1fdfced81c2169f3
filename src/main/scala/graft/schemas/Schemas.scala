package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schemas for the engine's canonical tables and the driver fixtures.
  *
  * The canonical chunk-store schema mirrors the reference index declaration
  * (reference: db_utils.py:53-91); fixture schemas mirror FIXTURES.md (verified
  * against the parquet footers at sf0.001). Canonical tables never rely on
  * schema inference (reference declares its index idempotently,
  * db_utils.py:120-127).
  */
object Schemas {

  /** Embedding dimensionality — reference db_utils.py:33 (`VECTOR_DIMENSIONS`). */
  val VectorDimensions = 1536

  /** Canonical chunk store (reference db_utils.py:53-91). */
  val chunkStore: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("content_vector", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("filename", StringType, nullable = false),
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("text_hash", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("file_type", StringType, nullable = false),
    StructField("page_number", IntegerType, nullable = true),
    StructField("metadata", StringType, nullable = true)
  ))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))
}

/** Typed views used by the ingestion pipeline where flatMap-style chunking is
  * natural (SURVEY.md §1.2).
  */
final case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

final case class Chunk(
    id: String,
    content: String,
    filename: String,
    chunk_id: Int,
    text_hash: String,
    page_number: Int,
    // TRUE provenance (d16): 1-based start / exclusive end of the chunk in
    // the normalized document — substr(norm, start_off, end_off - start_off)
    // equals content. The reference only carries the chunk_id+1 shape.
    start_off: Int,
    end_off: Int)

final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

package graft.queries

import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` (§2.C): exact-hash variants live in
  * PipelineQueries (d04/d05); here are cross-load anti-join dedup, token-set
  * Jaccard (SQL-expressible → oracle-checked), and the MinHash-LSH / SimHash
  * near-dup operators (deterministic, oracle-free, unit-tested in
  * NearDupSpec).
  */
object DedupQueries extends QuerySet {

  def queries: Seq[Q] = Seq(

    // Cross-load dedup: rows whose hash is NOT present in the "existing"
    // half (doc_id < 250) — one distributed anti-join replacing the
    // reference's per-chunk index lookup (db_utils.py:135-146).
    Q("x01_crossload_dedup",
      (s, d) => {
        val hashed = t(s, d, "documents")
          .select(col("doc_id"), md5(normCol).as("text_hash"))
        val existing = hashed.filter(col("doc_id") < 250).select("text_hash").distinct()
        hashed.filter(col("doc_id") >= 250)
          .join(existing, Seq("text_hash"), "left_anti")
          .select("doc_id", "text_hash")
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (SELECT doc_id, md5($normSql) AS text_hash FROM documents),
        |existing AS (SELECT DISTINCT text_hash FROM h WHERE doc_id < 250)
        |SELECT f.doc_id, f.text_hash FROM h f
        |WHERE f.doc_id >= 250
        |  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.text_hash = f.text_hash)
        |ORDER BY f.doc_id""".stripMargin)),

    // Token-set Jaccard over candidate pairs (restricted id range keeps the
    // token join bounded; the unrestricted scale path is MinHash below).
    Q("x02_jaccard_stats",
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        val toks = docs.select(col("doc_id"), explode(split(lower(normCol), " ")).as("tok")).distinct()
        val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val inter = toks.as("a").join(toks.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("i"))
        val jac = inter
          .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sa"), Seq("da"))
          .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("sz", "sb"), Seq("db"))
          .withColumn("jac", col("i") / (col("sa") + col("sb") - col("i")).cast("double"))
        jac.agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("jac") >= 0.9, 1L).otherwise(0L)).as("n_high"),
          round(avg("jac"), 6).as("avg_jac"))
      },
      Some(s"""WITH n AS (SELECT doc_id, lower($normSql) AS norm FROM documents WHERE doc_id < 200),
        |toks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM n),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT da, db, i / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jac
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = da
        |  JOIN sizes sb ON sb.doc_id = db)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(sum(CASE WHEN jac >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | round(avg(jac), 6) AS avg_jac
        |FROM jac""".stripMargin)),

    // MinHash-LSH near-dup pairs (scale path: banding → bucket join →
    // verify). Deterministic hash family; verified Jaccard attached.
    // Threshold 0.5 matches the 16x4 banding's S-curve (collision prob
    // ~0.65 at J=0.5, ~0.34 at J=0.4 — advertising a lower threshold would
    // overstate recall).
    Q("x03_minhash_neardup",
      (s, d) => NearDup.minhashNearDupPairs(s, t(s, d, "documents"), threshold = 0.5)),

    // SimHash near-dup pairs: the standard 64-bit simhash threshold
    // (hamming <= 3), exact recall under the 4x16 banding.
    Q("x04_simhash_neardup",
      (s, d) => NearDup.simhashNearDupPairs(s, t(s, d, "documents"), maxDistance = 3)),

    // MinHash LSH bucket-size profile: how balanced are the band buckets
    // (skew diagnostics for the bucket join at scale).
    Q("x05_minhash_bucket_profile",
      (s, d) => NearDup.minhashBuckets(s, t(s, d, "documents"))
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
          round(avg("n"), 6).as("avg_bucket"))
        .orderBy("band")),

    // Duplicate clusters: near-dup pairs -> connected components -> one
    // row per clustered doc (cluster = min member id). Alternating
    // large-star/small-star: O(log n) rounds independent of component
    // diameter (equivalence with plain propagation asserted in NearDupSpec).
    Q("x06_dup_clusters",
      (s, d) => {
        val pairs = NearDup.minhashNearDupPairs(s, t(s, d, "documents"), threshold = 0.5)
        NearDup.duplicateClustersAlternating(s, pairs).orderBy("id")
      }),

    // Jaccard CONTAINMENT |A∩B| / |A| — directional: detects a document
    // embedded inside a larger one, which symmetric Jaccard misses when
    // the sizes differ a lot (the quote/boilerplate-absorption case).
    Q("x07_containment",
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        val toks = docs.select(col("doc_id"),
          explode(split(lower(normCol), " ")).as("tok")).distinct()
        val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        toks.as("a").join(toks.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("i"))
          .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sa"), Seq("da"))
          .withColumn("containment", round(col("i") / col("sa").cast("double"), 6))
          .filter(col("containment") >= 0.8)
          .select(col("da").as("contained_id"), col("db").as("container_id"),
            col("containment"))
          .orderBy("contained_id", "container_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, lower($normSql) AS norm FROM documents WHERE doc_id < 200),
        |toks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM n),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS contained_id, db AS container_id,
        | round(i / CAST(sz AS DOUBLE), 6) AS containment
        |FROM inter JOIN sizes ON sizes.doc_id = da
        |WHERE round(i / CAST(sz AS DOUBLE), 6) >= 0.8
        |ORDER BY contained_id, container_id""".stripMargin))
  )
}

package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval + hybrid fusion (§2.A A15-A18 search surface).
  *
  * The reference's chunk store is a *searchable* index: `content` is
  * full-text searchable (db_utils.py:55-57) and a semantic-ranking
  * configuration is declared on the same index (db_utils.py:112-118), with
  * vector search (HNSW, db_utils.py:93-110) beside it. These two queries are
  * the engine-side equivalents: Okapi BM25 ranked top-k over the document
  * corpus, and reciprocal-rank fusion of the BM25 ranking with the
  * cosine-similarity ranking — the standard hybrid-retrieval combination the
  * reference's index exposes as "semantic + vector" search.
  *
  * Scale design (100 TB):
  *   - BM25 filters to the query's posting lists BEFORE any shuffle (the
  *     `tok isin terms` predicate sits under the tf aggregation), so shuffle
  *     volume is proportional to matching postings, not corpus size.
  *   - Document length is a narrow per-row computation (no corpus-wide
  *     token shuffle); df/N are one vocabulary-sized and one single-row
  *     broadcast.
  *   - Final top-k is an orderBy+limit → TakeOrderedAndProject (per-partition
  *     top-k + driver merge), never a full sort.
  *
  * Determinism: per-term contributions are exact doubles of integer inputs
  * (tf, df, dl are ints; avgdl is an exact long-sum / count division), the
  * per-document sum is ≤ |query| terms, and both engines order by the SAME
  * 6-dp-rounded score with a doc_id tiebreak.
  *
  * The BM25 construction (postings → tf → df → per-term contribution) is
  * built ONCE — [[bm25Contrib]] / [[bm25ContribSql]] — and shared by both
  * queries on both engines, so parameter or tokenization changes cannot
  * de-sync them.
  */
object KeywordQueries extends QuerySet {

  /** Fixed benchmark query — one rare term ("dup", df≈5% — the near-dup
    * marker token of the synthetic corpus) and two common ones, so IDF
    * separation is actually exercised.
    */
  private[queries] val Terms = Seq("dup", "vector", "stream")
  private val termsSqlList = Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  private[queries] val K1 = graft.operators.Retrieval.DefaultK1
  private[queries] val B = graft.operators.Retrieval.DefaultB

  /** Per-(doc, term) Okapi BM25 contribution `c`, served from the
    * PERSISTED inverted index ([[graft.sources.PostingStore]] — tokenize
    * once, probe forever; the probe reads the query terms' posting lists
    * out of the tok-sorted artifact via row-group pruning, not the corpus).
    * The formula is the same Lucene-smoothed expression as
    * [[graft.operators.Retrieval.bm25Contrib]] (behind `Graft.bm25TopK` for
    * caller-supplied corpora) over identical integer inputs, so scores are
    * bitwise equal and the oracle — which recomputes from `documents` —
    * stays the drift gate. Returns (doc_id, c).
    */
  private def bm25Contrib(s: SparkSession, d: String): DataFrame =
    graft.sources.PostingStore.bm25ContribFromIndex(s, d, Terms, K1, B)
      .withColumnRenamed("id", "doc_id")

  /** DuckDB equivalent of [[bm25Contrib]] over a restrictable corpus: CTE
    * chain ending in `contrib(doc_id, c)`. `where` restricts the document
    * set (s14 scores the streamed capped corpus; k01/k02 the whole table) —
    * one definition so the two can never drift.
    */
  private[queries] def bm25ContribSqlWhere(where: String): String =
    s"""docs AS (
       |  SELECT doc_id, lower($normSql) AS norm FROM documents $where),
       |dls AS (
       |  SELECT doc_id, array_length(string_split(norm, ' ')) AS dl, norm FROM docs),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dls),
       |tf AS (
       |  SELECT doc_id, dl, tok, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(string_split(norm, ' ')) AS tok FROM dls)
       |  WHERE tok IN $termsSqlList
       |  GROUP BY doc_id, dl, tok),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
       |      * (tf.tf * ($K1 + 1)) / (tf.tf + $K1 * (1 - $B + $B * tf.dl / s.avgdl)) AS c
       |  FROM tf JOIN df USING (tok), stats s)""".stripMargin

  private val bm25ContribSql: String = bm25ContribSqlWhere("")

  def queries: Seq[Q] = Seq(

    // Okapi BM25 top-k over the shared contribution frame.
    Q("k01_bm25_topk",
      (s, d) => bm25Contrib(s, d)
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_terms"),
          round(sum("c"), 6).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10),
      Some(s"""WITH $bm25ContribSql
        |SELECT doc_id, CAST(count(*) AS INT) AS n_terms, round(sum(c), 6) AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of the BM25
    // ranking and the cosine-similarity ranking over the documents that
    // carry both a text row and an embedding (doc_id = vec_id; vec 0 is the
    // query vector, as in v01). Ranks are computed over the SAME
    // 6-dp-rounded scores on both engines, so the integer rank arithmetic —
    // and therefore the fused score — is exact.
    //
    // Scale shape: RRF fuses top-N candidate LISTS, one per modality. Each
    // list is bounded by orderBy+limit(RrfCandidateLimit) — a
    // TakeOrderedAndProject — BEFORE its rank window, so the unpartitioned
    // row_number only ever sorts a constant-size frame, never the corpus
    // (the round-3 scale-killer). The oracle ranks the full candidate set;
    // the two agree because RrfCandidateLimit (100k) ≥ 50× every test
    // corpus, so the bounded lists ARE the full set at oracle SFs
    // (PlanSpec asserts every k02 window sits above a limit).
    Q("k02_hybrid_rrf",
      (s, d) => {
        val n = graft.operators.Retrieval.RrfCandidateLimit
        // Oracle-divergence guard: the DuckDB oracle ranks the FULL
        // candidate set, so the bounded lists must still BE the full set at
        // this SF. If a future corpus reaches the limit, ranks would shift
        // and tail docs silently contribute 0 — fail loudly instead.
        // Unfiltered count = parquet footer metadata (no column scan), so
        // the guard is effectively free even though it runs per invocation.
        // Both modalities are covered: the BM25 list is built over documents
        // and the vector list over embeddings, and the two counts can
        // diverge independently.
        val nCands = math.max(t(s, d, "documents").count(),
          t(s, d, "embeddings").count() - 1) // minus the query row
        require(nCands < n,
          s"k02 candidate set ($nCands) saturates RrfCandidateLimit=$n: " +
            "bounded per-modality lists no longer equal full rankings; " +
            "raise the limit for oracle comparison at this SF")
        val bm25 = bm25Contrib(s, d)
          .groupBy("doc_id").agg(round(sum("c"), 6).as("bm25"))
        val emb = t(s, d, "embeddings")
        val qv = broadcast(emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv")))
        // text list: every candidate doc with its (possibly zero) BM25
        // score, bounded before ranking
        val textTop = emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id").as("doc_id"))
          .join(bm25, Seq("doc_id"), "left")
          .withColumn("bm25", coalesce(col("bm25"), lit(0.0)))
          .orderBy(desc("bm25"), col("doc_id")).limit(n)
          .withColumn("rank_text",
            row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
          .select("doc_id", "rank_text")
        // vector list: cosine against the broadcast query vector, bounded
        // before ranking (the k01/v01 TakeOrdered pattern)
        val vecTop = emb.filter(col("vec_id") =!= 0).crossJoin(qv)
          .select(col("vec_id").as("doc_id"),
            round(cosineSim(col("embedding"), col("qv")), 6).as("sim"))
          .orderBy(desc("sim"), col("doc_id")).limit(n)
          .withColumn("rank_vec",
            row_number().over(Window.orderBy(desc("sim"), col("doc_id"))))
          .select("doc_id", "rank_vec")
        textTop.join(vecTop, Seq("doc_id"), "full")
          .withColumn("rrf",
            round(coalesce(lit(1.0) / (lit(60) + col("rank_text")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("rank_vec")), lit(0.0)), 6))
          .select("doc_id", "rank_text", "rank_vec", "rrf")
          .orderBy(desc("rrf"), col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH $bm25ContribSql,
        |bm25 AS (
        |  SELECT doc_id, round(sum(c), 6) AS bm25 FROM contrib GROUP BY doc_id),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |cands AS (
        |  SELECT e.vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim,
        |    coalesce(b.bm25, 0.0) AS bm25
        |  FROM embeddings e CROSS JOIN q
        |  LEFT JOIN bm25 b ON b.doc_id = e.vec_id
        |  WHERE e.vec_id <> 0),
        |ranked AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_text,
        |    row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_vec
        |  FROM cands)
        |SELECT doc_id, CAST(rank_text AS INT) AS rank_text, CAST(rank_vec AS INT) AS rank_vec,
        |  round(1.0 / (60 + rank_text) + 1.0 / (60 + rank_vec), 6) AS rrf
        |FROM ranked ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // ARTIFACT SQL SURFACE: the persisted index structures as first-class
    // SQL tables (Graft.registerArtifactViews) — a plain SQL user joins
    // the inverted-index postings against the df sidecar and the corpus
    // without touching the DataFrame API. The probe keeps the index access
    // path (tok = 'dup' pushes into the tok-sorted postings scan through
    // the view); the oracle recomputes postings and df from `documents`,
    // so any drift between the artifact and the corpus breaks the hash —
    // the same freshness contract every other store-served query carries.
    Q("k04_postings_sql",
      (s, d) => {
        graft.Graft.registerArtifactViews(s, d)
        s.sql("""SELECT p.doc_id, p.tf, f.df, d.source
          |FROM graft_postings p
          |JOIN graft_posting_df f ON p.tok = f.tok
          |JOIN graft_documents d ON d.doc_id = p.doc_id
          |WHERE p.tok = 'dup'
          |ORDER BY p.tf DESC, p.doc_id
          |LIMIT 20""".stripMargin)
      },
      Some(s"""WITH ${bm25ContribSqlWhere("")}
        |SELECT tf.doc_id, CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df, d.source
        |FROM tf JOIN df USING (tok) JOIN documents d ON d.doc_id = tf.doc_id
        |WHERE tok = 'dup'
        |ORDER BY tf DESC, tf.doc_id LIMIT 20""".stripMargin)),

    // DELETION PROPAGATION through the index — the lifecycle verb a
    // takedown / right-to-be-forgotten request needs: build the inverted
    // index over a capped corpus, tombstone every 10th document
    // (cost ∝ deleted ids — no rewrite), probe; then COMPACT (the rewrite
    // physically omits the rows and clears the sidecar) and probe again.
    // Both stages' BM25 top-10 are emitted and must hash-match ONE oracle
    // computed over the surviving documents — logical and physical
    // deletion are bit-identical, and deleted docs influence nothing
    // (df/stats self-align via the watermark protocol).
    Q("k05_delete_propagation",
      (s, d) => {
        val tag = d.replaceAll("[^a-zA-Z0-9]", "_") +
          "_" + graft.sources.PhysicalLayout.sourceTag(d, "documents")
        val idx = s"/tmp/graft_k05_${ProcessHandle.current().pid()}/idx_$tag"
        def probe(stage: String) = graft.sources.PostingStore
          .bm25ContribFromIndexAt(s, idx, Terms, K1, B)
          .withColumnRenamed("id", "doc_id")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_terms"),
            round(sum("c"), 6).as("score"))
          .orderBy(desc("score"), col("doc_id"))
          .limit(10)
          .withColumn("stage", lit(stage))
        // lifecycle once per process (DrillOnce; the driver's fresh-JVM
        // Verify always runs it): build → tombstone-delete → probe the
        // TOMBSTONE stage (materialized before compaction mutates the
        // store — the probe is lazy and would otherwise re-resolve the
        // pointer post-compact; its 10 rows are the memoized value) →
        // compact. Reps 2+ time the compacted probe plan.
        val tombRows = DrillOnce.cached(s"k05_$tag") {
          DrillOnce.freshDirs(idx)
          val corpus = t(s, d, "documents")
            .filter(col("doc_id") < 1000).select("doc_id", "text")
          graft.sources.PostingStore.build(s, corpus, idx)
          graft.sources.PostingStore.delete(s, idx,
            corpus.filter(col("doc_id") % 10 === 0).select("doc_id"))
          val rows = graft.operators.ScaleOps.checkpointed(probe("tombstone"))
            .collect().toSeq
            .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
          graft.sources.PostingStore.compact(s, idx)
          rows
        }
        val spark = s
        import spark.implicits._
        val tombstoneStage = tombRows
          .toDF("doc_id", "n_terms", "score", "stage")
          .select(col("doc_id"), col("n_terms").cast("int"),
            col("score"), col("stage"))
        tombstoneStage.unionByName(probe("compacted"))
          .orderBy(col("stage"), desc("score"), col("doc_id"))
      },
      Some(s"""WITH ${bm25ContribSqlWhere("WHERE doc_id < 1000 AND doc_id % 10 <> 0")},
        |top AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_terms, round(sum(c), 6) AS score
        |  FROM contrib GROUP BY doc_id
        |  ORDER BY score DESC, doc_id LIMIT 10)
        |SELECT doc_id, n_terms, score, stage
        |FROM top CROSS JOIN (VALUES ('compacted'), ('tombstone')) AS s(stage)
        |ORDER BY stage, score DESC, doc_id""".stripMargin)),

    // Positional phrase + proximity search — the full-text operator k01's
    // bag-of-words ranking can't express ("table hash" as an ADJACENT
    // phrase, plus an ordered within-3 proximity window). Postings are
    // filtered to the two query terms BEFORE the position join, so the
    // join input is proportional to the posting-list lengths, not corpus
    // size — the standard positional-index evaluation shape. All-integer
    // output (occurrence counts + 1-based first match position).
    Q("k03_phrase_search",
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), posexplode(split(lower(normCol), " ")).as(Seq("pos", "tok")))
        val p1 = tk.filter(col("tok") === "table").select(col("doc_id"), col("pos"))
        val p2 = tk.filter(col("tok") === "hash")
          .select(col("doc_id").as("d2"), col("pos").as("pos2"))
        p1.join(p2, col("doc_id") === col("d2") &&
            col("pos2").between(col("pos") + 1, col("pos") + 3))
          .groupBy("doc_id")
          .agg(sum((col("pos2") === col("pos") + 1).cast("long")).as("n_phrase"),
            count(lit(1)).as("n_near"),
            (min("pos") + 1).cast("int").as("first_pos"))
          .filter(col("n_phrase") >= 1)
          .orderBy(desc("n_phrase"), desc("n_near"), col("doc_id"))
          .limit(15)
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split(lower($normSql), ' ') AS toks FROM documents),
        |tk AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok FROM n),
        |p1 AS (SELECT doc_id, pos FROM tk WHERE tok = 'table'),
        |p2 AS (SELECT doc_id AS d2, pos AS pos2 FROM tk WHERE tok = 'hash'),
        |m AS (SELECT doc_id, pos, pos2 FROM p1 JOIN p2 ON doc_id = d2
        |       AND pos2 BETWEEN pos + 1 AND pos + 3)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN pos2 = pos + 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_phrase,
        | CAST(count(*) AS BIGINT) AS n_near,
        | CAST(min(pos) AS INT) AS first_pos
        |FROM m GROUP BY doc_id HAVING n_phrase >= 1
        |ORDER BY n_phrase DESC, n_near DESC, doc_id LIMIT 15""".stripMargin))
  )
}

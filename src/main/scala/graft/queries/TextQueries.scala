package graft.queries

import graft.operators.TextAnalysis
import graft.operators.ScaleOps.CheckpointSyntax
import graft.text.TextKernel
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (§2.C): token counting, quality
  * ratios, length histograms, vocabulary stats, language-ID, fingerprints.
  * Every query here carries a DuckDB oracle: the pure-Scala kernels
  * (language-ID, quality composite, rolling/winnow fingerprints) are
  * mirrored into SQL — codepoint-based lengths, and wrapping 64-bit hash
  * arithmetic emulated in HUGEINT. Known out-of-scope divergence: Java
  * toLowerCase(ROOT) vs DuckDB lower() differ on a handful of full-case
  * mappings (e.g. U+0130); irrelevant for ASCII stopword membership.
  *
  * All are embarrassingly parallel scans — no shuffle except the final
  * aggregates, which run map-side partial first (Catalyst default).
  */
object TextQueries extends QuerySet {

  /** t12 winnow parameters — single definition shared by the engine body
    * and (spliced) by its DuckDB oracle: k-gram length, winnow window,
    * boilerplate document-frequency cap, min shared fingerprints per pair.
    */
  private val WinnowK = 16
  private val WinnowW = 4
  private val FpDfCap = 20
  private val WinnowMinShared = 10

  /** t20 Count-Min-Sketch geometry — depth (independent hash rows) and
    * width (counters per row), spliced into the DuckDB oracle. Deliberately
    * fixture-sized (vocab is only ~hundreds of types): at 2x64 the sketch
    * measurably OVERESTIMATES colliding heavy hitters at both SFs (1-2 of
    * the top 20), so the graded estimates exercise real sketch behavior
    * instead of degenerating to the exact counts. Production sizing is
    * w = ceil(e/eps), d = ceil(ln(1/delta)) — still O(KB).
    */
  private val CmsD = 2
  private val CmsW = 64

  def queries: Seq[Q] = Seq(

    Q("t01_token_stats",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), normCol.as("norm"))
        .select(col("doc_id"),
          length(col("norm")).as("n_chars_norm"),
          size(split(col("norm"), " ")).as("n_tokens"),
          round((length(col("norm")) - (size(split(col("norm"), " ")) - 1))
            / size(split(col("norm"), " ")).cast("double"), 6).as("mean_token_len"))
        .orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
        |SELECT doc_id, CAST(length(norm) AS INT) AS n_chars_norm,
        | CAST(array_length(string_split(norm, ' ')) AS INT) AS n_tokens,
        | round((length(norm) - (array_length(string_split(norm, ' ')) - 1))
        |   / CAST(array_length(string_split(norm, ' ')) AS DOUBLE), 6) AS mean_token_len
        |FROM n ORDER BY doc_id""".stripMargin)),

    Q("t02_quality_ratios",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), normCol.as("norm"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("norm"), lit("[.,;:!?]"), lit(0))).as("n_punct"),
          size(regexp_extract_all(col("norm"), lit("[0-9]"), lit(0))).as("n_digits"),
          size(regexp_extract_all(col("norm"), lit("[A-Z]"), lit(0))).as("n_upper"),
          round(size(regexp_extract_all(col("norm"), lit("[.,;:!?]"), lit(0)))
            / greatest(length(col("norm")), lit(1)).cast("double"), 6).as("punct_ratio"))
        .orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(norm, '[.,;:!?]')) AS INT) AS n_punct,
        | CAST(len(regexp_extract_all(norm, '[0-9]')) AS INT) AS n_digits,
        | CAST(len(regexp_extract_all(norm, '[A-Z]')) AS INT) AS n_upper,
        | round(len(regexp_extract_all(norm, '[.,;:!?]'))
        |   / CAST(greatest(length(norm), 1) AS DOUBLE), 6) AS punct_ratio
        |FROM n ORDER BY doc_id""".stripMargin)),

    Q("t03_stopword_ratio",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), lower(normCol).as("norm"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("norm"),
            lit("\\b(the|a|of|and|in|to|is)\\b"), lit(0))).as("n_stop"),
          size(split(col("norm"), " ")).as("n_tokens"),
          round(size(regexp_extract_all(col("norm"), lit("\\b(the|a|of|and|in|to|is)\\b"), lit(0)))
            / size(split(col("norm"), " ")).cast("double"), 6).as("stop_ratio"))
        .orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, lower($normSql) AS norm FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(norm, '\\b(the|a|of|and|in|to|is)\\b')) AS INT) AS n_stop,
        | CAST(array_length(string_split(norm, ' ')) AS INT) AS n_tokens,
        | round(len(regexp_extract_all(norm, '\\b(the|a|of|and|in|to|is)\\b'))
        |   / CAST(array_length(string_split(norm, ' ')) AS DOUBLE), 6) AS stop_ratio
        |FROM n ORDER BY doc_id""".stripMargin)),

    Q("t04_length_histogram",
      (s, d) => t(s, d, "documents")
        .groupBy((floor(col("n_chars") / 100) * 100).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg("n_chars"), 6).as("avg_chars"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n, round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin)),

    Q("t05_lang_distribution",
      (s, d) => t(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          round(avg("n_chars"), 6).as("avg_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars, round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("t06_vocabulary_stats",
      (s, d) => t(s, d, "documents")
        .select(explode(split(normCol, " ")).as("tok"))
        .agg(count(lit(1)).as("total_tokens"),
          countDistinct("tok").as("distinct_tokens"),
          max(length(col("tok"))).as("max_token_len")),
      Some(s"""WITH n AS (SELECT $normSql AS norm FROM documents),
        |toks AS (SELECT unnest(string_split(norm, ' ')) AS tok FROM n)
        |SELECT CAST(count(*) AS BIGINT) AS total_tokens,
        | CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens,
        | CAST(max(length(tok)) AS INT) AS max_token_len
        |FROM toks""".stripMargin)),

    Q("t07_top_tokens",
      (s, d) => t(s, d, "documents")
        .select(explode(split(lower(normCol), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("tok"))
        .limit(20),
      Some(s"""WITH n AS (SELECT lower($normSql) AS norm FROM documents),
        |toks AS (SELECT unnest(string_split(norm, ' ')) AS tok FROM n)
        |SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // Heuristic language-ID (pure Scala, §2.C). The heuristic is exact
    // arithmetic over token/stopword counts, so the full decision procedure
    // (CJK codepoint share, per-language stopword hit counts, argmax with
    // lexicographic tie-break) is mirrored verbatim in the DuckDB oracle.
    Q("t08_langid",
      (s, d) => {
        val spark = s
        import spark.implicits._
        t(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)]
          .map { case (id, lang, text) => (id, lang, TextAnalysis.detectLanguage(text)) }
          .toDF("doc_id", "lang", "predicted_lang")
          .orderBy("doc_id")
      },
      Some(TextQueries.langIdOracle)),

    // Rolling-hash document fingerprint (§2.C). The polynomial hash wraps
    // in 64-bit two's-complement; DuckDB has no wrapping arithmetic, so the
    // oracle emulates it in HUGEINT (128-bit): fold (31*h + c) mod 2^64 over
    // the codepoints, then reinterpret values >= 2^63 as negative BIGINT.
    Q("t09_fingerprint",
      (s, d) => {
        val spark = s
        import spark.implicits._
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) => (id, TextKernel.rollingFingerprint(TextKernel.normalize(text))) }
          .toDF("doc_id", "fingerprint")
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
        |fp AS (SELECT doc_id,
        |  CASE WHEN norm = '' THEN CAST(1125899906842597 AS HUGEINT)
        |       ELSE list_reduce(
        |         list_prepend(CAST(1125899906842597 AS HUGEINT),
        |           list_transform(split(norm, ''), c -> unicode(c))),
        |         (acc, c) -> (31 * acc + c) % CAST(18446744073709551616 AS HUGEINT)) END AS h
        |  FROM n)
        |SELECT doc_id, CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |  THEN h - CAST(18446744073709551616 AS HUGEINT) ELSE h END AS BIGINT) AS fingerprint
        |FROM fp ORDER BY doc_id""".stripMargin)),

    // Quality scoring (pure Scala composite). Every ratio is exact integer
    // arithmetic followed by one double division, and the gates fire on the
    // UNROUNDED values on both sides — so the whole composite mirrors into
    // DuckDB SQL exactly. The score is emitted as an integer decile
    // (floor(score*10 + 0.5)): Scala sums 0.4+0.3+0.3 in binary doubles
    // while DuckDB sums DECIMAL literals exactly, so the raw doubles differ
    // in the last ulp — the decile grid absorbs that representational gap
    // without weakening the gate semantics.
    Q("t10_quality_score",
      (s, d) => {
        val spark = s
        import spark.implicits._
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            val q = TextAnalysis.quality(text)
            (id, q.nTokens, math.floor(q.meanTokenLen * 1e6 + 0.5) / 1e6,
              math.floor(q.stopwordRatio * 1e6 + 0.5) / 1e6,
              math.floor(q.score * 10 + 0.5).toInt)
          }
          .toDF("doc_id", "n_tokens", "mean_token_len", "stop_ratio", "quality_decile")
          .orderBy("doc_id")
      },
      Some(TextQueries.qualityOracle)),

    // Winnowing fingerprints (partial-overlap dedup): shared-fingerprint
    // counts for candidate pairs — any shared substring of length >= 19
    // (k=16, w=4) produces at least one shared fingerprint. Corpus-wide:
    // the fingerprint self-join is de-skewed by a document-frequency cap
    // (a fingerprint present in more than FpDfCap documents is boilerplate
    // and is dropped before the join — the same prefix-filter guard the
    // shingle joins in DedupQueries use), so join fan-out per fingerprint
    // is bounded by cap² at any corpus size. Narrow map + equi-join.
    //
    // Oracle: the winnow kernel mirrors into SQL. Each k-gram hash is the
    // base-257 polynomial mod 2^64 (the rolling recurrence computes exactly
    // that in Long wrapping arithmetic), emulated in HUGEINT then
    // reinterpreted as signed BIGINT because the kernel's min-comparison is
    // over SIGNED longs. The emitted fingerprint per window is the
    // window-min VALUE, so the kernel's rightmost tie-break (which only
    // picks a position, not a value) doesn't affect the distinct set; full
    // windows only (p <= nGrams - window + 1), with the <= window-size
    // corpus edge case collapsing to the global min at p = 1.
    Q("t12_winnow_overlap",
      (s, d) => {
        val spark = s
        import spark.implicits._
        // materialized once: the winnow kernel is the expensive part and
        // the frame is read three times (hot agg + both self-join sides)
        val fps = graft.operators.ScaleOps.spread(
          t(s, d, "documents")
            .select(col("doc_id"), col("text")).as[(Long, String)])
          .flatMap { case (id, text) =>
            TextKernel.winnow(text, k = WinnowK, window = WinnowW)
              .iterator.map(fp => (id, fp)) }
          .toDF("doc_id", "fp").distinct().graftCheckpoint()
        val capped = graft.operators.NearDup.dfCapped(fps, "fp", FpDfCap)
        capped.as("a").join(capped.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("shared_fps"))
          .filter(col("shared_fps") >= WinnowMinShared)
          .orderBy("id_a", "id_b")
      },
      // every winnow constant below is spliced from the SAME Scala vals the
      // engine uses (k, window, df cap, min-shared) — they cannot drift
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
        |ch AS (SELECT doc_id, list_transform(split(norm, ''), c -> unicode(c)) AS codes,
        |              length(norm) AS L FROM n WHERE length(norm) >= $WinnowK),
        |pos AS (SELECT doc_id, codes, unnest(range(1, L - ${WinnowK - 2})) AS p FROM ch),
        |fph AS (SELECT doc_id, p,
        |  list_reduce(list_prepend(CAST(0 AS HUGEINT), codes[p : p + ${WinnowK - 1}]),
        |    (acc, c) -> (257 * acc + c) % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM pos),
        |fps AS (SELECT doc_id, p,
        |  CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |    THEN h - CAST(18446744073709551616 AS HUGEINT) ELSE h END AS BIGINT) AS fp,
        |  max(p) OVER (PARTITION BY doc_id) AS n_grams
        |  FROM fph),
        |sel AS (SELECT doc_id, p, n_grams,
        |  min(fp) OVER (PARTITION BY doc_id ORDER BY p
        |                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wfp
        |  FROM fps),
        |fpset AS (SELECT DISTINCT doc_id, wfp AS fp FROM sel
        |          WHERE p <= greatest(1, n_grams - ${WinnowW - 1})),
        |capped AS (SELECT doc_id, fp FROM fpset
        |  WHERE fp IN (SELECT fp FROM fpset GROUP BY fp HAVING count(*) <= $FpDfCap)),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS shared_fps
        |  FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared_fps FROM pairs
        |WHERE shared_fps >= $WinnowMinShared ORDER BY id_a, id_b""".stripMargin)),

    // BPE-ish pre-tokenization (letters / digits / single punctuation as
    // separate tokens — the GPT-2-style regex split, simplified).
    Q("t11_bpe_tokens",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), lower(normCol).as("norm"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("norm"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_subtokens"),
          size(array_distinct(regexp_extract_all(col("norm"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))).as("n_distinct"))
        .orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, lower($normSql) AS norm FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_subtokens,
        | CAST(len(list_distinct(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INT) AS n_distinct
        |FROM n ORDER BY doc_id""".stripMargin)),

    // REAL BPE training, round 1, oracle-checked: the top-20 adjacent
    // character-pair frequencies over the corpus word-frequency table — the
    // exact quantity the first merge decision maximizes, computed by the
    // OPERATOR (BpeTokenizer.wordFreqs → pairCounts: one distributed word
    // aggregation, then vocabulary-bounded driver counting — the IVF
    // training shape) and recomputed from `documents` in plain SQL by the
    // oracle. Deeper rounds (merge table, encode) are not SQL-expressible
    // and are pinned by BpeSpec's golden merge tables + properties instead
    // (the chunker discipline).
    Q("t19_bpe_pair_freqs",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val wf = graft.text.BpeTokenizer.wordFreqs(t(s, d, "documents"), "text")
        val counts = graft.text.BpeTokenizer.pairCounts(
          wf.map { case (w, f) => (graft.text.BpeTokenizer.symbols(w), f) })
        counts.toSeq.map { case ((l, r), c) => (l, r, c) }
          .toDF("l_sym", "r_sym", "pair_n")
          .orderBy(desc("pair_n"), col("l_sym"), col("r_sym"))
          .limit(20)
      },
      Some(s"""WITH n AS (SELECT lower($normSql) AS norm FROM documents),
        |w AS (SELECT unnest(string_split(norm, ' ')) AS w FROM n),
        |wv AS (SELECT w FROM w WHERE w <> ''),
        |p AS (SELECT w, unnest(range(1, length(w))) AS i FROM wv)
        |SELECT substr(w, CAST(i AS INT), 1) AS l_sym,
        | substr(w, CAST(i AS INT) + 1, 1) AS r_sym,
        | CAST(count(*) AS BIGINT) AS pair_n
        |FROM p GROUP BY 1, 2
        |ORDER BY pair_n DESC, l_sym, r_sym LIMIT 20""".stripMargin)),

    // TF-IDF: the top-scoring token per document under ln(N/df) idf.
    // Three aggregations (tf, df, N) + one window; the df table is
    // vocabulary-sized, so its join is broadcast at any corpus scale.
    // ONE tokenize pass: df is DERIVED from the tf table (tf has exactly
    // one row per (doc, tok), so count-per-tok IS the document frequency)
    // instead of re-aggregating the token stream, and tf — read by both
    // the scoring join and the df derivation — is checkpointed so Catalyst
    // cannot re-run the corpus scan + explode once per consumer (at 100 TB
    // that second pass is a full extra read of the corpus; the
    // materialized tf frame is the compressed (doc, tok) aggregate, far
    // smaller than the raw token stream).
    Q("t13_tfidf_top_token",
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), explode(split(normCol, " ")).as("tok"))
        val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
          .graftCheckpoint()
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        // N stays in the lazy plan (broadcast single-row cross join, the
        // g09 pattern) — no eager count() job at query-construction time
        val n = broadcast(t(s, d, "documents")
          .agg(count(lit(1)).cast("double").as("n_docs")))
        val scored = tf.join(broadcast(df), "tok").crossJoin(n)
          .select(col("doc_id"), col("tok"),
            round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("tfidf"), col("tok"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "tok", "tfidf")
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (
        |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tok,
        |    round(tf * ln(n / CAST(df AS DOUBLE)), 6) AS tfidf
        |  FROM tf JOIN df USING (tok), n),
        |ranked AS (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
        |  FROM scored)
        |SELECT doc_id, tok, tfidf FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Distinct-count sketch (Apache DataSketches HLL, built into Spark):
    // exact vs sketched vocabulary size per source. The sketch is the 100 TB
    // path — mergeable, fixed-size state vs countDistinct's full shuffle of
    // the key set. The raw estimate is engine-specific, so the DECLARED
    // output is (exact count, within-5%-tolerance flag): DuckDB recomputes
    // the exact count and expects every flag = 1, which turns the sketch's
    // error bound into a driver-graded assertion — an estimator drift
    // beyond 5% now fails the oracle, not just the unit test.
    Q("t14_hll_sketch",
      (s, d) => t(s, d, "documents")
        .select(col("source"), explode(split(lower(normCol), " ")).as("tok"))
        .groupBy("source")
        .agg(countDistinct("tok").as("exact_distinct"),
          hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est"))
        .select(col("source"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct"))
            <= col("exact_distinct") * 0.05).cast("int").as("within_5pct"))
        .orderBy("source"),
      Some(s"""SELECT source,
        | CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct,
        | 1 AS within_5pct
        |FROM (SELECT source, unnest(string_split(lower($normSql), ' ')) AS tok
        |      FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Sketch ALGEBRA (the property that makes sketches matter at 100 TB):
    // per-source HLL sketches built independently, then merged with
    // hll_union_agg — the estimate of the union must land within 5% of the
    // exact corpus-wide distinct count. This is the map-side-mergeable
    // aggregation shape: fixed-size state per source/partition, one tiny
    // shuffle of sketch bytes instead of the full token stream. Graded by
    // the same tolerance-flag oracle pattern as t14.
    Q("t18_hll_union",
      (s, d) => {
        // tk feeds the sketch agg AND the exact-distinct baseline —
        // checkpoint so the corpus tokenizes once (t13/g09 discipline)
        val tk = graft.operators.ScaleOps.checkpointed(
          t(s, d, "documents")
            .select(col("source"), explode(split(lower(normCol), " ")).as("tok")))
        val per = tk.groupBy("source").agg(hll_sketch_agg(col("tok")).as("sk"))
        val merged = per.agg(
          count(lit(1)).as("n_sketches"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = tk.agg(countDistinct("tok").as("exact_distinct"))
        merged.crossJoin(exact).select(
          col("n_sketches").cast("int").as("n_sketches"),
          col("exact_distinct"),
          (abs(col("est") - col("exact_distinct"))
            <= col("exact_distinct") * 0.05).cast("int").as("within_5pct"))
      },
      Some(s"""SELECT CAST(count(DISTINCT source) AS INT) AS n_sketches,
        | CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct,
        | 1 AS within_5pct
        |FROM (SELECT source, unnest(string_split(lower($normSql), ' ')) AS tok
        |      FROM documents)""".stripMargin)),

    // Zipf fit: slope of log(freq) vs log(rank) over the corpus token
    // distribution — natural text sits near -1; a far-off slope flags
    // synthetic/templated corpora. Linear regression as an aggregate.
    Q("t15_zipf_fit",
      (s, d) => {
        val freq = t(s, d, "documents")
          .select(explode(split(lower(normCol), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("f"))
        val ranked = freq.withColumn("r",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(desc("f"), col("tok"))))
        ranked.agg(
          count(lit(1)).as("vocab"),
          round(regr_slope(log(col("f")), log(col("r"))), 4).as("zipf_slope"),
          round(regr_r2(log(col("f")), log(col("r"))), 4).as("fit_r2"))
      },
      Some(s"""WITH freq AS (
        |  SELECT tok, count(*) AS f FROM (
        |    SELECT unnest(string_split(lower($normSql), ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |ranked AS (
        |  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq)
        |SELECT CAST(count(*) AS BIGINT) AS vocab,
        | round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
        | round(regr_r2(ln(f), ln(r)), 4) AS fit_r2
        |FROM ranked""".stripMargin)),

    // Unicode NFC canonicalization (native codegen expression) ahead of
    // byte-level dedup/shingling: canonically-equal text must hash equal.
    // The fixture corpus is already NFC, so the oracle verifies the
    // identity path exactly; the combining-character compose path is
    // proven in NfcNormalizeSpec ("e"+U+0301 → "é" etc.).
    Q("t16_nfc_normalize",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          md5(graft.expressions.GraftFunctions.nfc_normalize(col("text"))).as("nfc_hash"),
          (length(graft.expressions.GraftFunctions.nfc_normalize(col("text")))
            === length(col("text"))).cast("int").as("len_unchanged"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(nfc_normalize(text)) AS nfc_hash,
        | CAST(length(nfc_normalize(text)) = length(text) AS INT) AS len_unchanged
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Corpus top trigrams, join-free like g08's bigrams: three offset
    // slices zipped per document (narrow maps), one aggregation exchange
    // of (trigram, count) pairs. greatest(.,0) guards docs with <3 tokens
    // (negative slice length is an error under ANSI).
    Q("t17_top_trigrams",
      (s, d) => {
        val withToks = t(s, d, "documents")
          .select(split(normCol, " ").as("toks"))
        val len3 = greatest(size(col("toks")) - 2, lit(0))
        withToks
          .select(explode(zip_with(
            zip_with(
              slice(col("toks"), lit(1), len3),
              slice(col("toks"), lit(2), len3),
              (a, b) => concat(a, lit(" "), b)),
            slice(col("toks"), lit(3), len3),
            (ab, c) => concat(ab, lit(" "), c))).as("trigram"))
          .groupBy("trigram").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("trigram"))
          .limit(20)
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        |tk AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok FROM n)
        |SELECT a.tok || ' ' || b.tok || ' ' || c.tok AS trigram,
        | CAST(count(*) AS BIGINT) AS n
        |FROM tk a
        |JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |JOIN tk c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin)),

    // Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005) — the
    // MERGEABLE-sketch form of t07's top-tokens: counters are (row, bucket)
    // sums, additive and commutative, so they partial-aggregate map-side and
    // merge across partitions (or whole corpora) without ever shuffling
    // tokens; sketch size is d*w counters regardless of vocabulary, vs the
    // vocabulary-sized exchange of an exact groupBy. The hash family is
    // md5-derived (the x04/x05 convention) so the DuckDB oracle rebuilds
    // the sketch counter-for-counter: estimates are deterministic, and the
    // CMS guarantee — an estimate NEVER undershoots the true count — is
    // graded as an output column for the exact top-20.
    Q("t20_cms_heavy_hitters",
      (s, dir) => {
        // toks feeds the sketch build AND the exact top-20 baseline —
        // checkpoint so the corpus tokenizes once (t13/g09 discipline)
        // spread before the checkpoint (the g17 note): the sketch's 1.1M
        // md5 bucket hashes run over the checkpoint's pinned partitioning
        val toks = graft.operators.ScaleOps.checkpointed(
          graft.operators.ScaleOps.spread(t(s, dir, "documents")
            .select(explode(split(lower(normCol), " ")).as("tok"))))
        def bucket(i: org.apache.spark.sql.Column, tok: org.apache.spark.sql.Column) =
          pmod(conv(substring(md5(concat(i.cast("string"), lit(":"), tok)), 1, 15),
            16, 10).cast("long"), lit(CmsW.toLong))
        val sketch = toks
          .select(explode(sequence(lit(0), lit(CmsD - 1))).as("i"), col("tok"))
          .select(col("i"), bucket(col("i"), col("tok")).as("b"))
          .groupBy("i", "b").agg(count(lit(1)).as("c"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col("tok")).limit(20)
        top.select(col("tok"), col("cnt"),
            explode(sequence(lit(0), lit(CmsD - 1))).as("i"))
          .withColumn("b", bucket(col("i"), col("tok")))
          .join(broadcast(sketch), Seq("i", "b"))
          .groupBy("tok", "cnt").agg(min(col("c")).as("cms_est"))
          .withColumn("no_underestimate", col("cms_est") >= col("cnt"))
          .orderBy(desc("cnt"), col("tok"))
      },
      Some(s"""WITH n AS (SELECT lower($normSql) AS norm FROM documents),
        |toks AS (SELECT unnest(string_split(norm, ' ')) AS tok FROM n),
        |ii AS (SELECT unnest(range(0, $CmsD)) AS i),
        |sk AS (SELECT i,
        |    CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 15))
        |      AS BIGINT) % $CmsW AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM toks CROSS JOIN ii GROUP BY 1, 2),
        |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks
        |  GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20),
        |probe AS (SELECT t.tok, t.cnt, ii.i,
        |    CAST(('0x' || substring(md5(CAST(ii.i AS VARCHAR) || ':' || t.tok), 1, 15))
        |      AS BIGINT) % $CmsW AS b
        |  FROM top t CROSS JOIN ii)
        |SELECT p.tok, p.cnt, min(s.c) AS cms_est,
        |  (min(s.c) >= p.cnt) AS no_underestimate
        |FROM probe p JOIN sk s ON s.i = p.i AND s.b = p.b
        |GROUP BY 1, 2 ORDER BY cnt DESC, tok""".stripMargin)),

    // CORPUS → TRAINING SEQUENCES end to end: train BPE merges on the
    // corpus (t19's bounded-vocabulary shape), encode EVERY document under
    // the trained table via the vocabulary-bounded broadcast join
    // (BpeTokenizer.corpusTokenCounts — each distinct word encoded once,
    // one corpus scan regardless of merge depth), then pack the real token
    // counts into fixed-budget training sequences per source shard
    // (Graft.packSequences — running-sum window partitioned by source, so
    // packing parallelizes across shards at any corpus size). The chain is
    // the missing last mile between the tokenizer family (t11/t19) and the
    // packing family (g06): actual trained-tokenizer counts, not
    // whitespace word counts, reach the packer. HASH-GATED through the
    // golden-VALUES pattern (BPE encode is not SQL-expressible — the
    // chunker discipline): the xor-folded digest of every document's
    // (doc_id, source, pack_id) assignment pins the entire packing, and
    // the summary stats pin the token accounting; BpeSpec's golden merge
    // tables + properties certify the encode the digests then pin.
    Q("t21_bpe_encode_pack",
      (s, d) => {
        val docs = t(s, d, "documents")
        // ONE vocabulary aggregation serves both training and the encode
        // join (corpusTokenCounts would otherwise re-run wordFreqs)
        val wf = graft.text.BpeTokenizer.wordFreqs(docs, "text")
        val merges = graft.text.BpeTokenizer.train(wf, BpeMergeRounds)
        val packed = graft.operators.ScaleOps.checkpointed(
          graft.Graft.packSequences(
            graft.text.BpeTokenizer
              .corpusTokenCounts(docs, "doc_id", "text", merges,
                vocabulary = Some(wf.map(_._1)))
              .join(docs.select("doc_id", "source"), "doc_id"),
            "n_tokens", PackTokenBudget, "source", "doc_id"))
        val perPack = packed.groupBy("source", "pack_id")
          .agg(sum("n_tokens").as("pk"), count(lit(1)).as("pd"))
        val stats = perPack.agg(
          sum("pd").as("n_docs"), sum("pk").as("total_tokens"),
          count(lit(1)).as("n_packs"), max("pk").as("max_pack_tokens"))
        val digest = packed.agg(
          expr("bit_xor(xxhash64(doc_id, source, pack_id))").as("packs_digest"))
        stats.crossJoin(digest)
      },
      Some(goldenBySize(
        "n_docs BIGINT, total_tokens BIGINT, n_packs BIGINT, " +
          "max_pack_tokens BIGINT, packs_digest BIGINT",
        GoldenT21)))
  )

  /** t21's merge-table depth and per-sequence token budget. 64 merges
    * saturate the synthetic corpus's small vocabulary (training stops when
    * no pair repeats), which is the interesting regime: most words encode
    * to one or two learned tokens, some to character tails.
    */
  private val BpeMergeRounds = 64
  private val PackTokenBudget = 2048

  /** t21's pinned packing outcomes, keyed by fixture document count —
    * regenerate via tools/golden_chunk_oracles.md (GoldenGen prints them).
    */
  private val GoldenT21: Map[Long, Seq[String]] = Map(
    500L -> Seq("500, 48170, 38, 2180, 7881010267123398180"),
    5000L -> Seq("5000, 484495, 244, 2202, -8434606551620654490"))

  /** DuckDB mirror of `TextAnalysis.detectLanguage` — stopword IN-lists are
    * spliced from the SAME `stopwordProfiles` the engine uses, so the two
    * sides cannot drift. Decision order mirrors the Scala exactly: CJK
    * codepoint share > 5% → zh; no tokens or zero stopword hits → und;
    * otherwise argmax score with lexicographic tie-break (de < en < es < fr).
    */
  private[queries] def langIdOracle: String = {
    def inList(lang: String): String =
      TextAnalysis.stopwordProfiles(lang).toSeq.sorted.map(w => s"'$w'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT doc_id, lang, length(text) AS n_chars,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') END AS toks,
       |    len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]')) AS cjk
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, lang, cjk, n_chars, len(toks) AS nt,
       |    len(list_filter(toks, t -> t IN (${inList("en")}))) AS s_en,
       |    len(list_filter(toks, t -> t IN (${inList("de")}))) AS s_de,
       |    len(list_filter(toks, t -> t IN (${inList("es")}))) AS s_es,
       |    len(list_filter(toks, t -> t IN (${inList("fr")}))) AS s_fr
       |  FROM tk)
       |SELECT doc_id, lang,
       |  CASE WHEN cjk > 0 AND CAST(cjk AS DOUBLE) / n_chars > 0.05 THEN 'zh'
       |       WHEN nt = 0 OR greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_fr THEN 'es'
       |       ELSE 'fr' END AS predicted_lang
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of `TextAnalysis.quality`: exact integer counts, one
    * double division per ratio, gates on the unrounded values — identical
    * operation sequence on both engines (see t10's decile note).
    */
  private[queries] def qualityOracle: String = {
    val en = TextAnalysis.stopwordProfiles("en").toSeq.sorted.map(w => s"'$w'").mkString(", ")
    s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
       |tk AS (SELECT doc_id, norm,
       |  CASE WHEN norm = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(norm, ' ') END AS toks FROM n),
       |m AS (SELECT doc_id,
       |  len(toks) AS n_tokens,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) END AS mean_len,
       |  CASE WHEN length(norm) = 0 THEN 0.0 ELSE CAST(len(regexp_extract_all(norm, '[.,;:!?]')) AS DOUBLE) / length(norm) END AS punct_ratio,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> lower(t) IN ($en))) AS DOUBLE) / len(toks) END AS stop_ratio
       |  FROM tk)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       | floor(mean_len * 1e6 + 0.5) / 1e6 AS mean_token_len,
       | floor(stop_ratio * 1e6 + 0.5) / 1e6 AS stop_ratio,
       | CAST(floor((CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 0.4 ELSE 0.0 END
       |   + CASE WHEN punct_ratio > 0 AND punct_ratio < 0.1 THEN 0.3 ELSE 0.0 END
       |   + CASE WHEN stop_ratio > 0.05 THEN 0.3 ELSE 0.0 END) * 10 + 0.5) AS INT) AS quality_decile
       |FROM m ORDER BY doc_id""".stripMargin
  }
}

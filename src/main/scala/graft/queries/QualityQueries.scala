package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation surface (§2.C extension): the document-quality
  * gates a large-scale LLM pipeline runs between raw text and training
  * shards — Gopher-style heuristic filters (Rae et al. 2021, arXiv
  * 2112.11446 §A1.1), repetition ratios, token-distribution entropy,
  * deterministic hash-based train/val/test splits, stratified sampling,
  * token-budget sequence packing, PII-style pattern scans, n-gram stats,
  * and a corpus-unigram log-probability score (the cheap perplexity proxy).
  *
  * Every query is SQL-expressible and carries a DuckDB oracle.
  *
  * Scale notes (100 TB): all per-document metrics are narrow maps over the
  * scan followed by one partial-aggregated groupBy on `doc_id` (Catalyst
  * does map-side combine); nothing here shuffles raw text twice. The
  * corpus-level aggregates (top bigrams, unigram LM) shuffle only
  * (token, count) pairs, which are orders of magnitude smaller than the
  * input. Hash-split/sampling are stateless row-local predicates — they
  * parallelize perfectly and never need a global pass.
  */
object QualityQueries extends QuerySet {

  /** Token-level view: one row per (doc, token), tokens from THE shared
    * normalization (QuerySet.normCol — must agree with t01/t03/x02).
    */
  private def toks(s: SparkSession, d: String): DataFrame =
    // NOT spread (ScaleOps.spread): measured at sf0.1/local[32], the extra
    // exchange costs more than the split+explode kernel saves (g09 0.62 →
    // 1.06 s with spread) — tokenization here is cheap Catalyst codegen and
    // every consumer partial-aggregates map-side anyway
    t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"),
      explode(split(normCol, " ")).as("tok"))

  private val toksSql =
    s"""(SELECT doc_id, lang, source, unnest(string_split($normSql, ' ')) AS tok
       | FROM documents)""".stripMargin

  /** Stopword set shared with t03_stopword_ratio. */
  private[queries] val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")
  private[queries] val stopSqlList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Deterministic split bucket: first hex nibble of md5(doc_id).
    * '0'-'b' → train (12/16), 'c'-'d' → val (2/16), else test (2/16).
    * Hash-based splits are the only split that stays stable when the
    * corpus is re-sharded or appended to — row_number-based splits don't
    * survive a repartition.
    */
  private def splitCol: Column = {
    val nibble = substring(md5(col("doc_id").cast("string")), 1, 1)
    when(nibble <= "b", "train").when(nibble.isin("c", "d"), "val").otherwise("test")
  }
  private val splitSql =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
      |     ELSE 'test' END""".stripMargin

  def queries: Seq[Q] = Seq(

    // Gopher-style per-document quality gates: word-count bounds, mean word
    // length bounds, minimum distinct stopwords. Flags as INT so the
    // comparator sees identical representations.
    Q("g01_gopher_filters",
      (s, d) => toks(s, d)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          // gate on the UNROUNDED mean (matching the SQL's unrounded
          // BETWEEN) — rounding only the reported column
          avg(length(col("tok"))).as("mean_raw"),
          countDistinct(when(col("tok").isin(stopwords: _*), col("tok"))).as("n_stop_distinct"))
        .select(col("doc_id"), col("n_words"),
          round(col("mean_raw"), 6).as("mean_word_len"), col("n_stop_distinct"),
          col("n_words").between(50, 100000).cast("int").as("word_count_ok"),
          col("mean_raw").between(3.0, 10.0).cast("int").as("word_len_ok"),
          (col("n_stop_distinct") >= 2).cast("int").as("stopwords_ok"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | round(avg(length(tok)), 6) AS mean_word_len,
        | CAST(count(DISTINCT CASE WHEN tok IN $stopSqlList THEN tok END) AS BIGINT) AS n_stop_distinct,
        | CAST(count(*) BETWEEN 50 AND 100000 AS INT) AS word_count_ok,
        | CAST(avg(length(tok)) BETWEEN 3.0 AND 10.0 AS INT) AS word_len_ok,
        | CAST(count(DISTINCT CASE WHEN tok IN $stopSqlList THEN tok END) >= 2 AS INT) AS stopwords_ok
        |FROM $toksSql GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Repetition ratios (the Gopher/C4 duplicate-content gates): fraction
    // of the doc taken by its most common token, duplicate-token fraction.
    Q("g02_repetition",
      (s, d) => toks(s, d)
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max("c").as("top_cnt"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(col("top_cnt") / col("n_tokens"), 6).as("top_token_frac"),
          round(lit(1.0) - col("n_distinct") / col("n_tokens"), 6).as("dup_token_frac"),
          (col("top_cnt") / col("n_tokens") > 0.2).cast("int").as("repetitive"))
        .orderBy("doc_id"),
      Some(s"""WITH c AS (SELECT doc_id, tok, count(*) AS c FROM $toksSql GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_token_frac,
        | round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_token_frac,
        | CAST(max(c) / CAST(sum(c) AS DOUBLE) > 0.2 AS INT) AS repetitive
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Shannon entropy of the per-document token distribution — low entropy
    // = TEMPLATE/boilerplate content. round(4): float-sum order differs
    // between engines; margin sized to the accumulated error.
    Q("g03_token_entropy",
      (s, d) => {
        val cnt = toks(s, d).groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("doc_id").agg(sum("c").as("n"))
        cnt.join(tot, "doc_id")
          .groupBy("doc_id")
          .agg(max("n").as("n_tokens"),
            round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 4).as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT doc_id, tok, count(*) AS c FROM $toksSql GROUP BY doc_id, tok),
        |tot AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id)
        |SELECT c.doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        | round(-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 4) AS entropy
        |FROM c JOIN tot ON c.doc_id = tot.doc_id
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // Deterministic hash-based train/val/test split, faceted by language —
    // the split assignment must be a pure function of the row (doc_id), so
    // re-running on re-sharded data yields the same membership.
    Q("g04_hash_split",
      (s, d) => t(s, d, "documents")
        .select(splitCol.as("split"), col("lang"), col("n_chars"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 6).as("avg_chars"))
        .orderBy("split", "lang"),
      Some(s"""SELECT $splitSql AS split, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)),

    // Stratified deterministic sample: ~3/16 of each language stratum by
    // the same md5-nibble trick. Sampling by content hash (not rand()) is
    // reproducible across runs, partitionings, and engines.
    Q("g05_stratified_sample",
      (s, d) => t(s, d, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          round(avg("n_chars"), 6).as("avg_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        | round(avg(n_chars), 6) AS avg_chars,
        | CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '2'
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Token-budget sequence packing: concatenate docs per source in doc_id
    // order; a doc's pack is floor(startOffset / budget). One window over
    // (source, doc_id) — at scale this is the standard pre-tokenization
    // packing pass, parallel per source shard.
    Q("g06_sequence_packing",
      (s, d) => {
        val budget = 2048
        val sized = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(split(normCol, " ")).cast("long").as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        sized
          .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
          .withColumn("pack_id", floor(col("offset") / budget))
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("source", "pack_id")
      },
      Some(s"""WITH sized AS (
        |  SELECT doc_id, source,
        |    CAST(array_length(string_split($normSql, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |  FROM sized)
        |SELECT source, CAST(floor(o / 2048) AS BIGINT) AS pack_id,
        | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        | CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM off GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin)),

    // PII-style pattern scan: emails / URLs / IPv4 / long-token counts per
    // doc. On this synthetic corpus the first three are structurally zero —
    // the point is the (oracle-checked) scan machinery; character-class
    // regexes chosen for Java-regex / RE2 agreement.
    Q("g07_pattern_scan",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), normCol.as("norm"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("norm"),
            lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("norm"),
            lit("https?://[^ ]+"), lit(0))).as("n_urls"),
          size(regexp_extract_all(col("norm"),
            lit("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"), lit(0))).as("n_ipv4"),
          size(regexp_extract_all(col("norm"),
            lit("[a-z]{8,}"), lit(0))).as("n_long_tokens"))
        .orderBy("doc_id"),
      // (the s-interpolator processes escapes even in triple quotes, so
      // '\\.' below reaches DuckDB as the single-backslash '\.' — same
      // escaped-dot regex the Spark lit() side compiles to)
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(norm, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(norm, 'https?://[^ ]+')) AS INT) AS n_urls,
        | CAST(len(regexp_extract_all(norm, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS INT) AS n_ipv4,
        | CAST(len(regexp_extract_all(norm, '[a-z]{8,}')) AS INT) AS n_long_tokens
        |FROM n ORDER BY doc_id""".stripMargin)),

    // PII-style REDACTION (the masking transform g07 only scans for):
    // email → [EMAIL], URL → [URL], IPv4 → [IP] applied in that order, plus
    // the long-token class → [LONG] so the transform provably fires on the
    // synthetic fixtures (emails/URLs/IPs are structurally zero there, as
    // in g07). A narrow map — no shuffle at all before the final sort; the
    // oracle applies the identical replacement chain (RE2/Java-agreed
    // character-class regexes, 'g' flag = Spark's replace-all default) and
    // must reproduce the redacted text's md5 exactly. Counts are measured
    // on the pre-redaction text, like g07.
    Q("g15_pii_redact",
      (s, d) => {
        // SHARED masking chain + patterns (operators.Curation, also behind
        // Graft.redactPii); the oracle below splices the SAME constants
        val masked = graft.operators.Curation.redactPii(
          col("norm"), maskLongTokens = true)
        // spread: eight regex passes per document (4 extract_all + the
        // 4-stage masking chain) are a CPU kernel the single-file scan
        // would otherwise run on one task
        graft.operators.ScaleOps.spread(
          t(s, d, "documents")
          .select(col("doc_id"), normCol.as("norm")))
          .select(col("doc_id"),
            (size(regexp_extract_all(col("norm"),
              lit(graft.operators.Curation.EmailPattern), lit(0)))
              + size(regexp_extract_all(col("norm"),
                  lit(graft.operators.Curation.UrlPattern), lit(0)))
              + size(regexp_extract_all(col("norm"),
                  lit(graft.operators.Curation.IpPattern), lit(0)))
              + size(regexp_extract_all(col("norm"),
                  lit(graft.operators.Curation.LongTokenPattern), lit(0))))
              .as("n_masked"),
            md5(masked).as("redacted_hash"),
            length(masked).as("n_chars_redacted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
        |r AS (SELECT doc_id, norm,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(norm,
        |          '${graft.operators.Curation.EmailPattern}', '[EMAIL]', 'g'),
        |        '${graft.operators.Curation.UrlPattern}', '[URL]', 'g'),
        |      '${graft.operators.Curation.IpPattern}', '[IP]', 'g'),
        |    '${graft.operators.Curation.LongTokenPattern}', '[LONG]', 'g') AS masked
        |  FROM n)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(norm, '${graft.operators.Curation.EmailPattern}'))
        |   + len(regexp_extract_all(norm, '${graft.operators.Curation.UrlPattern}'))
        |   + len(regexp_extract_all(norm, '${graft.operators.Curation.IpPattern}'))
        |   + len(regexp_extract_all(norm, '${graft.operators.Curation.LongTokenPattern}')) AS INT) AS n_masked,
        | md5(masked) AS redacted_hash,
        | CAST(length(masked) AS INT) AS n_chars_redacted
        |FROM r ORDER BY doc_id""".stripMargin)),

    // Corpus-level top bigrams: built per row with zip_with over the token
    // array (a narrow map — no self-join, no positional shuffle); the only
    // exchange is the final groupBy, which moves (bigram, count) pairs,
    // orders of magnitude smaller than the token stream.
    Q("g08_top_bigrams",
      (s, d) => {
        val withToks = t(s, d, "documents")
          .select(split(normCol, " ").as("toks"))
        withToks
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("bigram"))
          .limit(20)
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        |tk AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok FROM n)
        |SELECT a.tok || ' ' || b.tok AS bigram, CAST(count(*) AS BIGINT) AS n
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

    // Unigram-LM document score (cheap perplexity proxy): mean ln p(tok)
    // under the corpus unigram distribution. Two aggregations + one
    // broadcast-sized join (vocabulary << corpus).
    Q("g09_unigram_logprob",
      (s, d) => {
        // tk feeds the frequency agg AND the scoring join; freq feeds the
        // total agg AND the broadcast join — checkpoint both so the corpus
        // is scanned + tokenized exactly once (the t13/g14 discipline;
        // without it each consumer re-runs the scan + explode)
        val tk = graft.operators.ScaleOps.checkpointed(
          toks(s, d).select("doc_id", "tok"))
        val freq = graft.operators.ScaleOps.checkpointed(
          tk.groupBy("tok").agg(count(lit(1)).as("c")))
        val total = freq.agg(sum("c").as("total"))
        tk.join(broadcast(freq), "tok")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg(log(col("c") / col("total"))), 4).as("mean_logprob"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, tok FROM $toksSql),
        |freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |tot AS (SELECT sum(c) AS total FROM freq)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        | round(avg(ln(c / CAST(total AS DOUBLE))), 4) AS mean_logprob
        |FROM tk JOIN freq USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // The whole curation funnel as one row: how many docs survive each
    // successive gate (cumulative AND, in pipeline order).
    Q("g10_filter_funnel",
      (s, d) => {
        val m = toks(s, d)
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_words"),
            count(lit(1)).as("n_distinct"),
            max("c").as("top_cnt"),
            round(sum(col("c") * length(col("tok"))) / sum("c"), 6).as("mean_word_len"))
        val wordsOk = col("n_words").between(50, 100000)
        val lenOk = col("mean_word_len").between(3.0, 10.0)
        val repOk = col("top_cnt") / col("n_words") <= 0.2
        m.agg(
          count(lit(1)).as("n_total"),
          sum(wordsOk.cast("long")).as("after_word_count"),
          sum((wordsOk && lenOk).cast("long")).as("after_word_len"),
          sum((wordsOk && lenOk && repOk).cast("long")).as("after_repetition"))
      },
      Some(s"""WITH c AS (SELECT doc_id, tok, count(*) AS c FROM $toksSql GROUP BY doc_id, tok),
        |m AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, max(c) AS top_cnt,
        |        round(sum(c * length(tok)) / CAST(sum(c) AS DOUBLE), 6) AS mean_word_len
        |      FROM c GROUP BY doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(CAST(n_words BETWEEN 50 AND 100000 AS INT)) AS BIGINT) AS after_word_count,
        | CAST(sum(CAST(n_words BETWEEN 50 AND 100000
        |   AND mean_word_len BETWEEN 3.0 AND 10.0 AS INT)) AS BIGINT) AS after_word_len,
        | CAST(sum(CAST(n_words BETWEEN 50 AND 100000
        |   AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND top_cnt / CAST(n_words AS DOUBLE) <= 0.2 AS INT)) AS BIGINT) AS after_repetition
        |FROM m""".stripMargin)),

    // Benchmark-contamination check: corpus documents sharing >= 3 distinct
    // 8-grams with a holdout ("benchmark") set — the decontamination pass
    // run before training. 8-grams are built per row (narrow transform over
    // the token array); the join ships only distinct (doc, gram) pairs, and
    // the heavy side can be hash-partitioned on gram with the (small)
    // benchmark side broadcast at scale.
    Q("g11_contamination",
      (s, d) => {
        val k = 8
        // spread: the tokenize + 8-gram array build + explode all run
        // map-side before the distinct's shuffle — on the single-file
        // scan that whole kernel was one task
        val docsT = graft.operators.ScaleOps.spread(
          t(s, d, "documents")
            .select(col("doc_id"), split(normCol, " ").as("toks")))
        // grams feeds BOTH the bench and corpus filters — checkpoint so
        // the tokenize + gram explode + distinct runs once (g09 discipline)
        val grams = graft.operators.ScaleOps.checkpointed(docsT
          .select(col("doc_id"), explode(
            when(size(col("toks")) >= k,
              expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
                s"i -> array_join(slice(toks, i, $k), ' '))"))
              .otherwise(array().cast("array<string>"))).as("gram"))
          .distinct())
        val bench = grams.filter(col("doc_id") % 10 === 0)
          .withColumnRenamed("doc_id", "bench_id")
        val corpus = grams.filter(col("doc_id") % 10 =!= 0)
          .withColumnRenamed("doc_id", "corpus_id")
        corpus.join(broadcast(bench), "gram")
          .groupBy("corpus_id", "bench_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 3)
          .orderBy("corpus_id", "bench_id")
      },
      Some(s"""WITH dt AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(toks) - 7, 0)),
        |      i -> array_to_string(toks[i:i+7], ' '))) AS gram
        |  FROM dt)),
        |pairs AS (
        |  SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS n_shared
        |  FROM g c JOIN g b ON c.gram = b.gram
        |  WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |  GROUP BY 1, 2)
        |SELECT corpus_id, bench_id, CAST(n_shared AS BIGINT) AS n_shared
        |FROM pairs WHERE n_shared >= 3 ORDER BY corpus_id, bench_id""".stripMargin)),

    // Temperature-based source mixing (multinomial sampling weights,
    // alpha = 0.7 as in multilingual/multi-source LM training): per-source
    // token mass -> natural share p_i -> mixing weight w_i ∝ p_i^alpha,
    // boost = w/p is the per-source up/down-sampling factor (low-resource
    // sources get boost > 1, the head gets < 1). One tiny aggregation per
    // source then driver-free window arithmetic over the 20-row result —
    // the 100 TB cost is the token-count scan, which t01 already pays.
    Q("g12_temperature_mix",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        t(s, d, "documents")
          .groupBy("source")
          .agg(sum(size(split(normCol, " "))).as("n_tokens"))
          .withColumn("p", col("n_tokens") / sum("n_tokens").over(w))
          .withColumn("wgt", pow(col("p"), 0.7) / sum(pow(col("p"), 0.7)).over(w))
          .select(col("source"), col("n_tokens"),
            round(col("p"), 6).as("share"),
            round(col("wgt"), 6).as("weight"),
            round(col("wgt") / col("p"), 4).as("boost"))
          .orderBy("source")
      },
      Some(s"""WITH src AS (
        |  SELECT source, sum(len(string_split($normSql, ' '))) AS n_tokens
        |  FROM documents GROUP BY source),
        |p AS (
        |  SELECT source, n_tokens,
        |    n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS p
        |  FROM src)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(p, 6) AS share,
        | round(pow(p, 0.7) / sum(pow(p, 0.7)) OVER (), 6) AS weight,
        | round((pow(p, 0.7) / sum(pow(p, 0.7)) OVER ()) / p, 4) AS boost
        |FROM p ORDER BY source""".stripMargin)),

    // Perplexity-bucket profile: documents deciled by their unigram-LM
    // score (g09's mean ln p(tok) — the cheap perplexity proxy), one row
    // per decile with population and score range. This is the shape of
    // LM-score-based filtering/curriculum pipelines: the bottom deciles
    // (most improbable token streams) are the drop candidates. Decile
    // assignment ties broken by doc_id on both engines.
    Q("g13_perplexity_buckets",
      (s, d) => {
        // same one-scan discipline as g09 (tk and freq both double-read)
        val tk = graft.operators.ScaleOps.checkpointed(
          toks(s, d).select("doc_id", "tok"))
        val freq = graft.operators.ScaleOps.checkpointed(
          tk.groupBy("tok").agg(count(lit(1)).as("c")))
        val total = freq.agg(sum("c").as("total"))
        val scored = tk.join(broadcast(freq), "tok")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(round(avg(log(col("c") / col("total"))), 6).as("lp"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("lp"), col("doc_id"))
        scored.withColumn("decile", ntile(10).over(w))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            round(min("lp"), 6).as("min_lp"),
            round(max("lp"), 6).as("max_lp"))
          .orderBy("decile")
      },
      Some(s"""WITH tk AS (SELECT doc_id, tok FROM $toksSql),
        |freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |tot AS (SELECT sum(c) AS total FROM freq),
        |scored AS (
        |  SELECT doc_id, round(avg(ln(c / CAST(total AS DOUBLE))), 6) AS lp
        |  FROM tk JOIN freq USING (tok), tot GROUP BY doc_id),
        |deciled AS (
        |  SELECT lp, ntile(10) OVER (ORDER BY lp, doc_id) AS decile FROM scored)
        |SELECT CAST(decile AS INT) AS decile, CAST(count(*) AS BIGINT) AS n_docs,
        | round(min(lp), 6) AS min_lp, round(max(lp), 6) AS max_lp
        |FROM deciled GROUP BY decile ORDER BY decile""".stripMargin)),

    // DSIR-style importance weight (data selection via importance
    // resampling, Xie et al. 2023 — public method): per-token mean
    // log-likelihood ratio of a target-domain unigram LM (the lang='en'
    // slice) against the full-corpus source LM, add-1 smoothed over the
    // shared corpus vocabulary. Selection resamples ∝ exp(weight); the
    // weight itself is emitted here. Scale: one aggregation pass builds
    // both LMs (target count = conditional sum), the combined LM table is
    // vocabulary-sized → broadcast to the scoring join — same shuffle
    // budget as g09.
    Q("g14_dsir_weight",
      (s, d) => {
        // SHARED scoring core (also behind Graft.dsirWeights) — one LM
        // aggregation pass, broadcast vocabulary join; see
        // operators.Curation.dsirScores
        val scores = graft.operators.Curation.dsirScores(
          t(s, d, "documents"), "doc_id", "text", col("lang") === "en")
        scores
          .join(t(s, d, "documents").select(col("doc_id").as("id"), col("lang")), "id")
          .select(col("id").as("doc_id"), col("lang"), col("n_tokens"),
            // + 0.0 canonicalizes IEEE negative zero (-0.0 + 0.0 = +0.0):
            // a tiny negative mean rounds to -0.0 on one engine and 0.0 on
            // the other; both sides add the same term
            (round(col("dsir_weight"), 4) + 0.0).as("dsir_weight"))
          .orderBy("doc_id")
      },
      // tk mirrors dsirScores' tokenization exactly, including the
      // empty-normalized-document exclusion (such a doc has no tokens and
      // no output row)
      Some(s"""WITH tk AS (
        |  SELECT doc_id, lang, unnest(string_split(norm, ' ')) AS tok
        |  FROM (SELECT doc_id, lang, $normSql AS norm FROM documents)
        |  WHERE norm <> ''),
        |lm AS (SELECT tok, count(*) AS cs,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |       FROM tk GROUP BY tok),
        |consts AS (SELECT sum(cs) AS ns, sum(ct) AS nt, count(*) AS v FROM lm)
        |SELECT doc_id, max(lang) AS lang, CAST(count(*) AS BIGINT) AS n_tokens,
        | round(avg(ln((ct + 1) / CAST(nt + v AS DOUBLE))
        |         - ln((cs + 1) / CAST(ns + v AS DOUBLE))), 4) + 0.0 AS dsir_weight
        |FROM tk JOIN lm USING (tok), consts
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // CCNet-shaped model-based quality gate (Wenzek et al. 2020): train an
    // add-one bigram LM on the hash-split TRAIN partition (text/NgramLm —
    // pure counting, zip_with bigrams, no positional self-join), score
    // every held-out doc by mean ln p(t2|t1), and gate at a fixed
    // threshold. This is the step g09/g13 approximate with unigrams and
    // without a train/score separation — the separation is the point: the
    // model never sees the docs it filters, so the gate measures
    // reference-domain fit, not self-fit. Gate on the UNROUNDED mean
    // (g01 discipline), report the rounded one; threshold sits in a wide
    // empty band of the measured lp distribution (see
    // BigramLmKeepThreshold).
    Q("g16_bigram_lm_filter",
      (s, d) => {
        // docs feeds the train and held-out halves — checkpoint so the
        // corpus is scanned + tokenized once (g09 discipline)
        val docs = graft.operators.ScaleOps.checkpointed(
          t(s, d, "documents")
            .select(col("doc_id"), splitCol.as("split"),
              split(normCol, " ").as("toks")))
        val model = graft.text.NgramLm.train(graft.text.NgramLm.bigrams(
          docs.filter(col("split") === "train"), "doc_id", "toks"))
        val heldBg = graft.text.NgramLm.bigrams(
          docs.filter(col("split") =!= "train"), "doc_id", "toks")
        graft.text.NgramLm.score(heldBg, model, "doc_id")
          .select(col("doc_id"), col("n_bigrams"),
            round(col("lp"), 6).as("lp"),
            (col("lp") >= BigramLmKeepThreshold).cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, $splitSql AS split,
        |  string_split($normSql, ' ') AS toks FROM documents),
        |tk AS (SELECT doc_id, split, generate_subscripts(toks, 1) AS pos,
        |  unnest(toks) AS tok FROM n),
        |bg AS (SELECT a.doc_id, a.split, a.tok AS t1, b.tok AS t2
        |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bi AS (SELECT t1, t2, count(*) AS c2 FROM bg WHERE split = 'train' GROUP BY 1, 2),
        |uni AS (SELECT t1, count(*) AS c1 FROM bg WHERE split = 'train' GROUP BY 1),
        |v AS (SELECT count(DISTINCT t2) + 1 AS vocab FROM bg WHERE split = 'train'),
        |scored AS (
        |  SELECT g.doc_id, count(*) AS n_bigrams,
        |    avg(ln((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + CAST(vocab AS DOUBLE)))) AS lp
        |  FROM bg g LEFT JOIN bi ON g.t1 = bi.t1 AND g.t2 = bi.t2
        |    LEFT JOIN uni ON g.t1 = uni.t1, v
        |  WHERE g.split <> 'train' GROUP BY 1)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, round(lp, 6) AS lp,
        | CAST(lp >= $BigramLmKeepThreshold AS INT) AS keep
        |FROM scored ORDER BY doc_id""".stripMargin)),

    // Model-based quality classifier (text/NaiveBayes): distill the g01
    // Gopher gates into a multinomial NB trained on the hash-split TRAIN
    // partition's weak labels, then score every held-out doc by its
    // log-odds margin. The fastText-classifier shape of curation done as
    // pure counting: train = one (tok, class) aggregation (vocab-sized →
    // broadcast), score = one narrow join + groupBy — no solver, fully
    // SQL-recomputable. Predict on the UNROUNDED margin (g01 discipline);
    // measured min |margin| is 3e-4 (sf0.1) / 5e-4 (sf0.01), six orders
    // above the ~1e-10 worst-case float-summation spread of a
    // hundreds-of-terms ln sum, so pred cannot flip between engines.
    Q("g17_nb_quality_classifier",
      (s, d) => {
        // tk has THREE consumers (labeling agg, NB training, held-out
        // scoring) — checkpoint so the corpus tokenizes exactly once
        val tk = graft.operators.ScaleOps.checkpointed(
          toks(s, d).select("doc_id", "tok"))
        // labels also has three consumers (train filter, held-out filter,
        // final join) and each would re-run the 1.1M-token aggregation —
        // checkpoint the ~docs-sized result so it aggregates exactly once
        val labels = graft.operators.ScaleOps.checkpointed(
          tk.groupBy("doc_id").agg(
            count(lit(1)).as("n_words"),
            avg(length(col("tok"))).as("mean_raw"),
            countDistinct(when(col("tok").isin(stopwords: _*), col("tok")))
              .as("n_stop"))
          .select(col("doc_id"),
            (col("n_words").between(50, 100000) &&
              col("mean_raw").between(3.0, 10.0) &&
              (col("n_stop") >= 2)).cast("int").as("label"),
            splitCol.as("split")))
        val trainLabels = labels.filter(col("split") === "train")
          .select("doc_id", "label")
        val model = graft.text.NaiveBayes.train(tk, trainLabels, "doc_id")
        val heldTok = tk.join(
          labels.filter(col("split") =!= "train").select("doc_id"), "doc_id")
        graft.text.NaiveBayes.score(heldTok, model, "doc_id")
          .join(labels.select("doc_id", "label"), "doc_id")
          .select(col("doc_id"), col("label"), col("n_tokens"),
            (col("margin") > 0).cast("int").as("pred"),
            round(col("margin"), 4).as("margin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, tok FROM $toksSql),
        |g AS (SELECT doc_id, count(*) AS n, avg(length(tok)) AS ml,
        |  count(DISTINCT CASE WHEN tok IN $stopSqlList THEN tok END) AS ns
        |  FROM tk GROUP BY doc_id),
        |lab AS (SELECT doc_id,
        |  CAST(n BETWEEN 50 AND 100000 AND ml BETWEEN 3.0 AND 10.0 AND ns >= 2 AS INT) AS label,
        |  $splitSql AS split FROM g),
        |tr AS (SELECT doc_id, label FROM lab WHERE split = 'train'),
        |cnt AS (SELECT tok, sum(label) AS c_pass, sum(1 - label) AS c_fail
        |  FROM tk JOIN tr USING (doc_id) GROUP BY tok),
        |tot AS (SELECT sum(c_pass) AS n_pass, sum(c_fail) AS n_fail, count(*) + 1 AS v FROM cnt),
        |pri AS (SELECT ln(CAST(sum(label) AS DOUBLE) / sum(1 - label)) AS lpr FROM tr),
        |scored AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    sum(ln((COALESCE(c_pass, 0) + 1.0) / (n_pass + v))
        |      - ln((COALESCE(c_fail, 0) + 1.0) / (n_fail + v))) AS s
        |  FROM tk t JOIN lab USING (doc_id) LEFT JOIN cnt USING (tok), tot
        |  WHERE lab.split <> 'train' GROUP BY t.doc_id)
        |SELECT doc_id, lab.label, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(s + lpr > 0 AS INT) AS pred, round(s + lpr, 4) AS margin
        |FROM scored JOIN lab USING (doc_id), pri ORDER BY doc_id""".stripMargin))
  )

  /** g16 keep gate on the held-out mean bigram log-prob. Measured lp
    * ranges: sf0.01 [-3.540, -3.312], sf0.1 [-3.738, -3.343]; the
    * threshold's nearest observed value at either SF is 1.7e-4 away —
    * nine orders above the engines' ULP-level ln() spread — and both flag
    * values occur at both SFs (drop rate 43% / 6%), so the gate is
    * exercised and cannot flip on float noise.
    */
  private val BigramLmKeepThreshold = -3.4326
}

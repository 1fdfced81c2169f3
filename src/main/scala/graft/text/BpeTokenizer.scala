package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer TRAINING (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL'16 —
  * the public algorithm; clean-room implementation). Replaces t11's
  * "BPE-ish regex" placeholder with the real thing: learned merge rules,
  * not a fixed token pattern.
  *
  * Scale shape (the IVF-training discipline): the corpus-sized work is ONE
  * distributed word-frequency aggregation; training itself runs on the
  * driver over the bounded vocabulary table (capped at `maxWords`, loudly
  * guarded — standard practice: BPE trains on word types weighted by
  * frequency, so cost is vocabulary-sized, not corpus-sized). Encoding with
  * the learned merges is a narrow per-word map.
  *
  * Determinism (oracle/golden requirement): the winning pair each round is
  * the maximum by (count, then lexicographically SMALLEST (left, right) on
  * ties); merges apply left-to-right non-overlapping. No RNG, no hash-order
  * dependence — the merge table is a pure function of the word-frequency
  * table, and [[encode]] applied to a training word reproduces that word's
  * final training segmentation (asserted in BpeSpec).
  *
  * Words are plain character sequences (no end-of-word marker): simplest
  * variant, pinned by the golden spec; a marker is a caller-side `word + "</w>"`
  * away and changes nothing structural.
  */
object BpeTokenizer {

  /** Distributed word-frequency table: whitespace words of the lowercased
    * normalized text, top `maxWords` by (freq DESC, word ASC) — a total
    * order, so the collected table is deterministic. Fails loudly if the
    * corpus vocabulary saturates the cap (silent truncation would change
    * the learned merges with no signal).
    */
  def wordFreqs(docs: DataFrame, textCol: String, maxWords: Int = 1 << 17): Seq[(String, Long)] = {
    import docs.sparkSession.implicits._
    val words = docs
      .select(explode(split(lower(trim(regexp_replace(col(textCol), "\\s+", " "))), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val out = words.orderBy(desc("f"), col("w")).limit(maxWords)
      .as[(String, Long)].collect().toSeq
    // a vocabulary of EXACTLY maxWords is complete (limit returned every
    // word); only a strictly larger one was truncated — that extra count
    // runs only in the boundary case, so the common path stays one job
    if (out.length == maxWords) {
      val vocab = words.count()
      require(vocab <= maxWords,
        s"corpus vocabulary ($vocab) exceeds maxWords=$maxWords: merge table " +
          "would silently depend on the truncation boundary; raise the cap")
    }
    out
  }

  /** Code-POINT symbols, not UTF-16 code units: a surrogate pair (emoji,
    * rare CJK) is one symbol, matching the character semantics of SQL
    * substr in the t19 oracle — `w.map(_.toString)` would split it into
    * two unpaired halves and the pair counts would drift on non-BMP text.
    */
  def symbols(w: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Adjacent-symbol pair counts over a symbolized word-frequency table —
    * round 1 of training when symbols are single characters (the
    * SQL-checkable quantity t19 grades). Every adjacent position counts,
    * weighted by word frequency.
    */
  def pairCounts(words: Seq[(IndexedSeq[String], Long)]): Map[(String, String), Long] = {
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (syms, f) =>
      var j = 0
      while (j < syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        counts.update(k, counts.getOrElse(k, 0L) + f)
        j += 1
      }
    }
    counts.toMap
  }

  /** One left-to-right, non-overlapping application of a merge rule. */
  def applyMerge(syms: IndexedSeq[String], left: String, right: String): IndexedSeq[String] = {
    if (syms.length < 2) return syms
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == left && syms(j + 1) == right) {
        out += left + right
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Train up to `numMerges` merge rules. Stops early when no pair occurs
    * at least twice (merging a count-1 pair memorizes a single word —
    * the conventional floor).
    */
  def train(wordFreqsTable: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    var words: Vector[(IndexedSeq[String], Long)] =
      wordFreqsTable.map { case (w, f) => (symbols(w), f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = pairCounts(words)
      if (counts.isEmpty) done = true
      else {
        // max count; ties broken by lexicographically smallest (left, right)
        val (bl, br, bc) = counts.foldLeft(("", "", Long.MinValue)) {
          case (best @ (l0, r0, c0), ((l, r), c)) =>
            if (c > c0 || (c == c0 && (l < l0 || (l == l0 && r < r0)))) (l, r, c)
            else best
        }
        if (bc < 2) done = true
        else {
          merges += ((bl, br))
          words = words.map { case (syms, f) => (applyMerge(syms, bl, br), f) }
          i += 1
        }
      }
    }
    merges.result()
  }

  /** Encode one word by replaying the merge rules in learned rank order —
    * reproduces the training segmentation for training words and
    * generalizes to unseen words (the standard BPE inference).
    */
  def encode(word: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    var syms = symbols(word)
    merges.foreach { case (l, r) => if (syms.length > 1) syms = applyMerge(syms, l, r) }
    syms
  }

  /** Per-document BPE token counts under a trained merge table — the
    * vocabulary-bounded encode shape: each DISTINCT word is encoded ONCE
    * driver-side (over the same bounded vocabulary training used), the
    * (word → token count) table broadcast-joins against one tokenize pass
    * of the corpus, and per-doc counts are a partial-aggregating groupBy —
    * no per-occurrence encode, no UDF in the hot path, corpus cost is one
    * scan regardless of merge-table depth. Tokenization is byte-identical
    * to [[wordFreqs]]'s (lowercased normalized whitespace words). Returns
    * (doc_id, n_words, n_tokens) for every document with >= 1 word.
    */
  def corpusTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)],
                        maxWords: Int = 1 << 17,
                        vocabulary: Option[Seq[String]] = None): DataFrame = {
    import docs.sparkSession.implicits._
    // callers that just trained pass the vocabulary they already
    // aggregated (t21) — otherwise one wordFreqs pass derives it
    val vocab = vocabulary.getOrElse(wordFreqs(docs, textCol, maxWords).map(_._1))
    val wt = broadcast(
      vocab.map(w => (w, encode(w, merges).length.toLong)).toDF("w", "wtoks"))
    val perWord = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(trim(regexp_replace(col(textCol), "\\s+", " "))),
          " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    // a caller-supplied vocabulary that does not cover the corpus would
    // silently drop every unseen word (and wordless docs) through the
    // inner join below — fail loudly instead (the wordFreqs-derived
    // default is complete by construction, so only the override pays
    // this one extra aggregation)
    val checked =
      if (vocabulary.isEmpty) perWord
      else {
        val pw = graft.operators.ScaleOps.checkpointed(perWord)
        val oov = pw.join(wt, Seq("w"), "left_anti").count()
        require(oov == 0,
          s"$oov distinct (doc, word) groups fall outside the supplied " +
            "vocabulary — encoding would silently drop them; extend the " +
            "vocabulary or pass vocabulary = None")
        pw
      }
    checked
      .join(wt, "w")
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("wtoks")).as("n_tokens"))
  }
}

package graft.text

import graft.SparkTestBase
import graft.sources.Tables

/** BPE tokenizer training, graded like the chunker: golden merge tables
  * (hand-checkable classic corpus + fixture digests), structural
  * properties, and determinism. Round-1 pair counts are additionally
  * oracle-checked end-to-end by the declared query t19_bpe_pair_freqs.
  */
class BpeSpec extends SparkTestBase {

  test("corpusTokenCounts equals a direct per-occurrence encode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "widest  newest newest low"),
      (3L, "lower widest"),
      (4L, "   ")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(
      BpeTokenizer.wordFreqs(docs, "text"), 8)
    val got = BpeTokenizer.corpusTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // direct recompute: encode every occurrence independently
    val expect = Map(
      1L -> Seq("low", "low", "lower", "newest"),
      2L -> Seq("widest", "newest", "newest", "low"),
      3L -> Seq("lower", "widest")
    ).map { case (id, ws) =>
      id -> (ws.size.toLong,
        ws.map(w => BpeTokenizer.encode(w, merges).length.toLong).sum)
    }
    assert(got == expect) // doc 4 (whitespace only) contributes no row
    // packing the real counts: pack sums reconstruct totals, ids contiguous
    val counts = got.toSeq.map { case (id, (w, t)) => (id, w, t, "s0") }
      .toDF("doc_id", "n_words", "n_tokens", "source")
    val packed = graft.Graft.packSequences(counts, "n_tokens", 5, "source", "doc_id")
    val perPack = packed.groupBy("pack_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("pk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perPack.values.sum == expect.values.map(_._2).sum)
    assert(perPack.keySet == (0L until perPack.size).toSet,
      "pack ids must be contiguous from 0")
    // a caller-supplied vocabulary that misses corpus words must fail
    // loudly, never silently drop them through the encode join
    val err = intercept[IllegalArgumentException] {
      BpeTokenizer.corpusTokenCounts(docs, "doc_id", "text", merges,
        vocabulary = Some(Seq("low", "lower"))).collect()
    }
    assert(err.getMessage.contains("outside the supplied"))
  }

  // the classic subword-NMT example corpus (Sennrich et al., ACL'16) — the
  // merge sequence is hand-checkable: es (9) before est (9) because counts
  // tie and training is deterministic by construction
  private val classic = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("golden: classic corpus merge table") {
    val merges = BpeTokenizer.train(classic, 8)
    assert(merges == Vector(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est")))
  }

  test("encode generalizes to an unseen word via learned subwords") {
    val merges = BpeTokenizer.train(classic, 8)
    // 'lowest' never appears in training; its parts do
    assert(BpeTokenizer.encode("lowest", merges) == Vector("low", "est"))
  }

  test("golden: fixture merge tables at sf0.001 and sf0.01") {
    def digestAt(dir: String): String = {
      val wf = BpeTokenizer.wordFreqs(Tables.load(spark, dir, "documents"), "text")
      val merges = BpeTokenizer.train(wf, 50)
      assert(merges.length == 50)
      java.security.MessageDigest.getInstance("MD5")
        .digest(merges.map(p => p._1 + "+" + p._2).mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    assert(digestAt("/root/testdata/sf0.001") == "c3ae76f0d80ca6c8b0da24abda8e6cb9")
    assert(digestAt("/root/testdata/sf0.01") == "5db6de5c7785ab9359fd274aa88ceaf1")
  }

  test("training is deterministic") {
    val wf = BpeTokenizer.wordFreqs(Tables.load(spark, sf, "documents"), "text")
    assert(BpeTokenizer.train(wf, 30) == BpeTokenizer.train(wf, 30))
  }

  test("encode reproduces the training segmentation for training words") {
    // replaying merges in rank order must land every training word exactly
    // where training left it — recompute the training end-state and compare
    val merges = BpeTokenizer.train(classic, 8)
    classic.foreach { case (w, _) =>
      var syms = BpeTokenizer.symbols(w)
      merges.foreach { case (l, r) => syms = BpeTokenizer.applyMerge(syms, l, r) }
      assert(BpeTokenizer.encode(w, merges) == syms)
    }
    assert(BpeTokenizer.encode("newest", merges) == Vector("newest"))
  }

  test("property: encode is lossless and bounded (incl. non-BMP input)") {
    val wf = BpeTokenizer.wordFreqs(Tables.load(spark, sf, "documents"), "text")
    val merges = BpeTokenizer.train(wf, 50)
    val tricky = Seq("a", "", "ab", "aaaaaa", "café", "😀x😀",
      "naïve-tests", "xyzzyqq") ++ wf.take(200).map(_._1)
    tricky.foreach { w =>
      val toks = BpeTokenizer.encode(w, merges)
      assert(toks.mkString("") == w, s"lossy encode of '$w'")
      assert(toks.length <= BpeTokenizer.symbols(w).length)
      if (w.nonEmpty) assert(toks.nonEmpty)
    }
    // a surrogate pair is ONE symbol
    assert(BpeTokenizer.symbols("😀x") == Vector("😀", "x"))
  }

  test("merging a count-1 pair is refused (early stop floor)") {
    // every pair occurs exactly once — nothing to learn
    assert(BpeTokenizer.train(Seq(("abcd", 1L)), 10).isEmpty)
  }

  test("vocabulary saturation fails loudly") {
    val docs = Tables.load(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      BpeTokenizer.wordFreqs(docs, "text", maxWords = 5)
    }
  }
}

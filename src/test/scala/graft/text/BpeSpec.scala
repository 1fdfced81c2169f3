package graft.text

import graft.SparkTestBase
import graft.sources.Tables

/** BPE tokenizer training, graded like the chunker: golden merge tables
  * (hand-checkable classic corpus + fixture digests), structural
  * properties, and determinism. Round-1 pair counts are additionally
  * oracle-checked end-to-end by the declared query t19_bpe_pair_freqs.
  */
class BpeSpec extends SparkTestBase {

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

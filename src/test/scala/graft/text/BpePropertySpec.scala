package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck properties of BPE training/encoding over arbitrary inputs
  * (the chunker-property discipline; BpeSpec holds the goldens). Word and
  * corpus generators cover unicode including non-BMP code points, where
  * the code-unit/code-point distinction actually bites.
  */
object BpePropertySpec extends Properties("BpeTokenizer") {

  private val wordGen: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.alphaLowerChar.map(_.toString),
    2 -> Gen.oneOf("é", "ß", "指", "😀", "-", "0"))).map(_.mkString)

  private val corpusGen: Gen[Seq[(String, Long)]] = for {
    words <- Gen.nonEmptyListOf(wordGen)
    freqs <- Gen.listOfN(words.length, Gen.choose(1L, 50L))
  } yield words.distinct.zip(freqs)

  property("encode is lossless for any word under any trained merge table") =
    forAllNoShrink(corpusGen, wordGen) { (corpus, w) =>
      val merges = BpeTokenizer.train(corpus, 30)
      BpeTokenizer.encode(w, merges).mkString("") == w
    }

  property("training is deterministic and bounded by numMerges") =
    forAllNoShrink(corpusGen, Gen.choose(0, 40)) { (corpus, n) =>
      val m1 = BpeTokenizer.train(corpus, n)
      m1 == BpeTokenizer.train(corpus, n) && m1.length <= n
    }

  property("encode reproduces the training segmentation for every training word") =
    forAllNoShrink(corpusGen) { corpus =>
      val merges = BpeTokenizer.train(corpus, 25)
      corpus.forall { case (w, _) =>
        var syms = BpeTokenizer.symbols(w)
        merges.foreach { case (l, r) => syms = BpeTokenizer.applyMerge(syms, l, r) }
        BpeTokenizer.encode(w, merges) == syms
      }
    }

  property("token count never exceeds symbol count and shrinks monotonically with merges") =
    forAllNoShrink(corpusGen, wordGen) { (corpus, w) =>
      val merges = BpeTokenizer.train(corpus, 30)
      val lens = (0 to merges.length).map(k => BpeTokenizer.encode(w, merges.take(k)).length)
      lens.head == BpeTokenizer.symbols(w).length &&
        lens.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true }
    }

  property("symbols splits by code point: concat restores, surrogates intact") =
    forAllNoShrink(wordGen) { w =>
      val syms = BpeTokenizer.symbols(w)
      syms.mkString("") == w && syms.forall(s => s.codePointCount(0, s.length) == 1)
    }
}

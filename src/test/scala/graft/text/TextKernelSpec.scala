package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextKernelSpec extends AnyFunSuite {

  test("normalize collapses whitespace runs and trims (ref embedding_utils.py:44-50)") {
    assert(TextKernel.normalize("  a\t\tb\n\nc  ") == "a b c")
    assert(TextKernel.normalize("a b") == "a b")
    assert(TextKernel.normalize("") == "")
    assert(TextKernel.normalize(null) == "")
    assert(TextKernel.normalize(" \n \t ") == "")
  }

  test("sanitizeKey restricts to [a-zA-Z0-9_-=] (ref embedding_utils.py:16-21)") {
    assert(TextKernel.sanitizeKey("file.pdf_0") == "file_pdf_0")
    assert(TextKernel.sanitizeKey("a b/c:d") == "a_b_c_d")
    assert(TextKernel.sanitizeKey("AZ09_-=") == "AZ09_-=")
    assert(TextKernel.sanitizeKey("héllo") == "h_llo")
  }

  test("md5Hex matches known vectors (ref embedding_utils.py:39-41)") {
    assert(TextKernel.md5Hex("") == "d41d8cd98f00b204e9800998ecf8427e")
    assert(TextKernel.md5Hex("hello") == "5d41402abc4b2a76b9719d911017c592")
    assert(TextKernel.md5Hex("The quick brown fox jumps over the lazy dog") ==
      "9e107d9d372bb6826bd81d3542a419d6")
  }

  test("tokens splits on whitespace") {
    assert(TextKernel.tokens("a  b\tc\nd").toSeq == Seq("a", "b", "c", "d"))
    assert(TextKernel.tokens("").isEmpty)
    assert(TextKernel.tokens("  ").isEmpty)
    assert(TextKernel.tokens(null).isEmpty)
  }

  test("shingles builds word n-grams, lowercased") {
    assert(TextKernel.shingles("A b c d", 2) == Set("a b", "b c", "c d"))
    assert(TextKernel.shingles("one", 3) == Set("one"))
    assert(TextKernel.shingles("", 3) == Set.empty[String])
  }

  test("charNgrams") {
    assert(TextKernel.charNgrams("abcd", 2) == Set("ab", "bc", "cd"))
    assert(TextKernel.charNgrams("ab", 5) == Set("ab"))
  }

  test("rollingFingerprint deterministic and content-sensitive") {
    assert(TextKernel.rollingFingerprint("abc") == TextKernel.rollingFingerprint("abc"))
    assert(TextKernel.rollingFingerprint("abc") != TextKernel.rollingFingerprint("abd"))
  }

  test("winnow: shared substring >= k+w-1 guarantees a shared fingerprint") {
    val shared = "this exact sentence is copied verbatim between both documents for overlap"
    val a = "prefix text unique to the first document. " + shared + " and a unique tail here"
    val b = "totally different opening content here. " + shared + " with another distinct ending"
    val c = "no overlap at all in this one, completely unrelated material throughout it"
    val fa = TextKernel.winnow(a)
    val fb = TextKernel.winnow(b)
    val fc = TextKernel.winnow(c)
    assert(fa.intersect(fb).nonEmpty, "documents sharing a long substring must share fingerprints")
    assert(fa.intersect(fc).size <= 1, "unrelated documents share at most coincidental fingerprints")
    // deterministic + compact (far fewer fingerprints than k-grams)
    assert(fa == TextKernel.winnow(a))
    assert(fa.size < a.length - 8 + 1)
  }

  test("winnow edge cases: short and empty input") {
    assert(TextKernel.winnow("", 8, 4).isEmpty)
    assert(TextKernel.winnow("short", 8, 4).isEmpty)
    assert(TextKernel.winnow("exactly8c", 8, 4).nonEmpty) // 9 chars -> 2 k-grams
  }
}

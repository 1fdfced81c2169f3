package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck invariants for the chunker (SURVEY.md §5.3): size bounds,
  * non-emptiness, input coverage, determinism — over randomized word/
  * separator soups at several size/overlap configs.
  */
object ChunkerPropertySpec extends Properties("RecursiveCharacterTextSplitter") {

  private val word = Gen.oneOf("alpha", "beta", "data", "spark", "x", "yy",
    "chunk", "vector", "the", "of", "a" * 25)
  private val sep = Gen.frequency(6 -> " ", 2 -> ". ", 1 -> "\n", 1 -> "\n\n", 1 -> "\t")
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 300)
    parts <- Gen.listOfN(n, Gen.zip(word, sep))
  } yield parts.map { case (w, s) => w + s }.mkString

  private val config = Gen.oneOf((400, 100), (100, 20), (50, 10))

  property("no chunk exceeds chunkSize when words fit") = forAllNoShrink(text, config) {
    case (t, (size, overlap)) =>
      val chunks = new RecursiveCharacterTextSplitter(size, overlap).splitText(t)
      // every word above is shorter than the smallest size, so all chunks
      // must respect the bound
      chunks.forall(_.length <= size)
  }

  property("no empty or whitespace-only chunks") = forAllNoShrink(text, config) {
    case (t, (size, overlap)) =>
      new RecursiveCharacterTextSplitter(size, overlap).splitText(t)
        .forall(c => c.strip().nonEmpty)
  }

  property("every input word appears in some chunk (coverage)") = forAllNoShrink(text, config) {
    case (t, (size, overlap)) =>
      val chunks = new RecursiveCharacterTextSplitter(size, overlap).splitText(t)
      val joined = chunks.mkString(" ")
      // the ". " separator may detach a trailing period from its word, so
      // coverage is checked on the alphabetic core of each token
      TextKernel.tokens(TextKernel.normalize(t))
        .map(_.replaceAll("[^a-z]", ""))
        .filter(_.nonEmpty)
        .forall(w => joined.contains(w))
  }

  property("deterministic") = forAllNoShrink(text, config) {
    case (t, (size, overlap)) =>
      val a = new RecursiveCharacterTextSplitter(size, overlap).splitText(t)
      val b = new RecursiveCharacterTextSplitter(size, overlap).splitText(t)
      a == b
  }

  property("chunkText normalization is idempotent") = forAllNoShrink(text) { t =>
    val once = Chunker.chunkText(t)
    once.forall(c => TextKernel.normalize(c) == c)
  }

  property("normalize is idempotent and length-nonincreasing") = forAllNoShrink(text) { t =>
    val n1 = TextKernel.normalize(t)
    TextKernel.normalize(n1) == n1 && n1.length <= t.length
  }

  property("md5 matches for equal input, differs on prefix change") = forAllNoShrink(text) { t =>
    val h = TextKernel.md5Hex(t)
    h == TextKernel.md5Hex(t) && (t.isEmpty || h != TextKernel.md5Hex("!" + t))
  }

  // ------------------------------------------------------------------
  // d16 provenance invariants over random separator soups (the golden
  // corpus pins 852 FIXED inputs; these hold for ARBITRARY \s-class
  // whitespace + printable text — the fixture reality; exotic unicode
  // whitespace where String.strip and regex-\s disagree falls back to
  // the guarded search path by construction).
  // ------------------------------------------------------------------

  property("offsets: substring predicate, coverage, monotone starts, whitespace-only gaps") =
    forAllNoShrink(text) { t =>
      val norm = TextKernel.normalize(t)
      val withOff = Chunker.chunkWithOffsets(t)
      val contentsMatch = withOff.map(_._1) == Chunker.chunkText(t)
      var prevStart = 0
      var prevEnd = 0
      val perChunk = withOff.forall { case (c, st, en) =>
        val span = st >= 1 && en == st + c.length &&
          norm.substring(st - 1, en - 1) == c
        val mono = st >= prevStart
        val gapOk = prevEnd == 0 || st <= prevEnd ||
          norm.substring(prevEnd - 1, st - 1).trim.isEmpty
        prevStart = st
        prevEnd = en
        span && mono && gapOk
      }
      val covered = withOff.isEmpty ||
        (withOff.head._2 == 1 && withOff.last._3 == norm.length + 1)
      contentsMatch && perChunk && covered
    }

  property("offsets: deterministic and geometry-independent of the string path") =
    forAllNoShrink(text, config) { case (t, (size, overlap)) =>
      val splitter = new RecursiveCharacterTextSplitter(size, overlap)
      val spans = splitter.splitSpans(t)
      val viaStrings = splitter.splitText(t)
      // span-tracked split mirrors the string split piece for piece
      spans.map { case (s, e) => t.substring(s, e).strip() }
        .filter(_.nonEmpty) == viaStrings.filter(_.strip().nonEmpty).map(_.strip())
    }
}

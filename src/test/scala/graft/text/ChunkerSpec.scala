package graft.text

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class ChunkerSpec extends AnyFunSuite {

  test("golden parity with the published LangChain algorithm (852 cases)") {
    val stream = getClass.getResourceAsStream("/splitter_goldens.json")
    assert(stream != null, "splitter_goldens.json missing — run tools/splitter_goldens.py")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(stream)
    var checked = 0
    root.elements().asScala.foreach { case node =>
      val size = node.get("size").asInt()
      val overlap = node.get("overlap").asInt()
      val text = node.get("text").asText()
      val expected = node.get("chunks").elements().asScala.map(_.asText()).toList
      val got = new RecursiveCharacterTextSplitter(size, overlap).splitText(text)
      assert(got == expected,
        s"mismatch size=$size overlap=$overlap text=${text.take(120)}…\n got=$got\n exp=$expected")
      checked += 1
    }
    assert(checked > 800)
  }

  test("empty and whitespace-only input produce no chunks") {
    assert(Chunker.chunkText("") == Nil)
    assert(Chunker.chunkText("   \n\t  ") == Nil)
    assert(Chunker.chunkText(null) == Nil)
  }

  test("short text yields itself, normalized") {
    assert(Chunker.chunkText("hello  world") == List("hello world"))
  }

  test("chunks respect size for splittable text") {
    val text = ("word " * 500).trim
    val chunks = new RecursiveCharacterTextSplitter(400, 100).splitText(text)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.length <= 400, s"chunk too long: ${c.length}"))
  }

  test("overlap: consecutive chunks share a suffix/prefix region") {
    val text = ("alpha beta gamma delta " * 100).trim
    val chunks = new RecursiveCharacterTextSplitter(400, 100).splitText(text)
    assert(chunks.size > 1)
    chunks.sliding(2).foreach { case List(a, b) =>
      // The tail tokens of a reappear at the head of b (overlap carry-over).
      val tailWord = a.split(" ").last
      assert(b.contains(tailWord))
    case _ => ()
    }
  }

  test("unsplittable run longer than chunk_size is emitted as single chars merged") {
    // "" separator splits into chars, merge reassembles windows of chunk_size.
    val text = "x" * 1000
    val chunks = new RecursiveCharacterTextSplitter(400, 100).splitText(text)
    assert(chunks.forall(_.length <= 400))
    assert(chunks.head.length == 400)
  }

  test("coverage: concatenated chunks contain all input content") {
    val text = ("the quick brown fox jumps. " * 50).trim
    val chunks = Chunker.chunkText(text)
    val joined = chunks.mkString(" ")
    TextKernel.tokens(TextKernel.normalize(text)).foreach { w =>
      assert(joined.contains(w.stripSuffix(".")))
    }
  }

  /** The d16 provenance invariants, point-checked on one text. */
  private def assertOffsets(text: String): Unit = {
    val norm = TextKernel.normalize(text)
    val withOff = Chunker.chunkWithOffsets(text)
    // contents identical to the un-provenance'd path (no semantic drift)
    assert(withOff.map(_._1) == Chunker.chunkText(text))
    var prevStart = 0
    var prevEnd = 0
    withOff.foreach { case (c, st, en) =>
      assert(st >= 1 && en == st + c.length, s"bad span ($st,$en) for '$c'")
      assert(norm.substring(st - 1, en - 1) == c, "substring predicate broken")
      assert(st >= prevStart, "chunk starts must be monotone")
      if (prevEnd > 0 && st > prevEnd) {
        val gap = norm.substring(prevEnd - 1, st - 1)
        assert(gap.trim.isEmpty, s"gap lost non-whitespace content: '$gap'")
      }
      prevStart = st
      prevEnd = en
    }
    if (withOff.nonEmpty) {
      assert(withOff.head._2 == 1, "first chunk must start at offset 1")
      assert(withOff.last._3 == norm.length + 1, "last chunk must end at |norm|+1")
    }
  }

  test("offset provenance: substring/coverage/gap invariants over the golden corpus (852 cases)") {
    val stream = getClass.getResourceAsStream("/splitter_goldens.json")
    assert(stream != null)
    val mapper = new ObjectMapper()
    val root = mapper.readTree(stream)
    var checked = 0
    // the golden texts are the adversarial corpus (random separators,
    // degenerate whitespace, unsplittable runs) — every one must satisfy
    // the d16 invariants at the DEFAULT geometry the pipeline ships
    root.elements().asScala.foreach { node =>
      assertOffsets(node.get("text").asText())
      checked += 1
    }
    assert(checked > 800)
    assertOffsets(("the quick brown fox jumps. " * 60).trim)
    assertOffsets("x" * 1000)
    assertOffsets("  a\n\nb  \t c  ")
    assert(Chunker.chunkWithOffsets("") == Nil)
    assert(Chunker.chunkWithOffsets(null) == Nil)
  }
}

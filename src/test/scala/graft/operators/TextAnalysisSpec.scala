package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  test("language ID on real-language samples") {
    assert(TextAnalysis.detectLanguage(
      "the cat sat on the mat and it was happy with his life") == "en")
    assert(TextAnalysis.detectLanguage(
      "der Hund ist nicht mit der Katze auf das Sofa gesprungen und ich bin froh") == "de")
    assert(TextAnalysis.detectLanguage(
      "el perro y la gata están en la casa y no quieren salir por que llueve") == "es")
    assert(TextAnalysis.detectLanguage(
      "le chien et le chat sont dans la maison et ils ne veulent pas sortir") == "fr")
    assert(TextAnalysis.detectLanguage("今天天气很好我们去公园散步吧") == "zh")
    assert(TextAnalysis.detectLanguage("") == "und")
    assert(TextAnalysis.detectLanguage("xyzzy qwerty asdf") == "und")
  }

  test("quality: natural text scores higher than garbage") {
    val good = TextAnalysis.quality(
      "The pipeline reads documents, normalizes the text, and writes chunks to the store. " +
      "Each chunk is hashed for deduplication.")
    val garbage = TextAnalysis.quality("zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    assert(good.score > garbage.score)
    assert(good.nTokens > 0 && good.punctRatio > 0 && good.stopwordRatio > 0)
  }

  test("quality handles empty/null") {
    assert(TextAnalysis.quality("").nTokens == 0)
    assert(TextAnalysis.quality(null).nTokens == 0)
  }

}

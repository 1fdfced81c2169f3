package graft

import graft.text.TextKernel
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** Properties of the deterministic split/sample logic. The JVM-side mirror
  * (first md5 nibble of the decimal key string) is definitionally the same
  * function the Spark columns compute; GraftSpec cross-checks the Spark
  * side against fixtures.
  */
object GraftPropertySpec extends Properties("GraftSplitSample") {

  private def nibble(key: Long): Char = TextKernel.md5Hex(key.toString).head

  private def split(key: Long): String = {
    val n = nibble(key)
    if (n <= 'b') "train" else if (n == 'c' || n == 'd') "val" else "test"
  }

  property("every key lands in exactly one split, deterministically") =
    forAllNoShrink(Gen.long) { k =>
      val s = split(k)
      Set("train", "val", "test").contains(s) && split(k) == s
    }

  property("sample(k) is a subset of sample(k+1)") = {
    val hexChars = "0123456789abcdef"
    forAllNoShrink(Gen.long, Gen.choose(1, 15)) { (key, k) =>
      val inK = nibble(key) <= hexChars.charAt(k - 1)
      val inK1 = nibble(key) <= hexChars.charAt(k)
      !inK || inK1
    }
  }

  property("split fractions approximate 12/2/2 sixteenths") = {
    val n = 4000
    val counts = (0L until n).map(split).groupBy(identity).view.mapValues(_.size).toMap
    math.abs(counts("train").toDouble / n - 12.0 / 16) < 0.03 &&
      math.abs(counts("val").toDouble / n - 2.0 / 16) < 0.02 &&
      math.abs(counts("test").toDouble / n - 2.0 / 16) < 0.02
  }
}

package graft.core

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the string/binary bounds machinery — the area
  * where three separate rounds found order bugs (UTF-16 vs UTF-8 compare,
  * surrogate-block truncation, DeleteIndex path ordering). Seeded, so
  * failures reproduce. The generator draws code points adversarially: ASCII,
  * the BMP private-use area just above the surrogate block (U+E000..),
  * U+FFFF, and supplementary-plane scalars — exactly the values where
  * UTF-16 code-unit order and UTF-8 byte order disagree.
  */
class BoundsPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1717)

  private def randomCodePoint(): Int = rnd.nextInt(6) match {
    case 0 => 'a' + rnd.nextInt(26) // ASCII letters
    case 1 => rnd.nextInt(0x80) max 1 // any ASCII (no NUL-adjacent bias)
    case 2 => 0xE000 + rnd.nextInt(0x1000) // BMP just above surrogates
    case 3 => 0xFF00 + rnd.nextInt(0x100) // BMP tail incl. U+FFFF
    case 4 => 0x10000 + rnd.nextInt(0x1000) // supplementary low
    case 5 => 0x10F000 + rnd.nextInt(0xFFF) // supplementary top incl. MAX-1
  }

  private def randomString(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(randomCodePoint()))
    sb.toString
  }

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def sign(i: Int): Int = Integer.signum(i)

  test("string compare equals UTF-8 byte order on adversarial unicode (1000 pairs)") {
    (0 until 1000).foreach { _ =>
      val (a, b) = (randomString(24), randomString(24))
      assert(sign(Bounds.compare(IceString, a, b)) ==
        sign(java.util.Arrays.compareUnsigned(utf8(a), utf8(b))),
        s"compare disagrees with UTF-8 order for ${a.codePoints().toArray.toSeq} " +
          s"vs ${b.codePoints().toArray.toSeq}")
    }
  }

  test("truncateLower stays a lower bound at every width (500 cases)") {
    (0 until 500).foreach { _ =>
      val s = randomString(24)
      val w = 1 + rnd.nextInt(20)
      val lo = Bounds.truncateLower(IceString, s, w).asInstanceOf[String]
      assert(lo.codePointCount(0, lo.length) <= w)
      assert(Bounds.compare(IceString, lo, s) <= 0,
        s"truncateLower($w) of ${s.codePoints().toArray.toSeq} is above the value")
      // and in the UTF-8 order the parquet stats use
      assert(java.util.Arrays.compareUnsigned(utf8(lo), utf8(s)) <= 0)
    }
  }

  test("truncateUpper stays an upper bound at every width (500 cases)") {
    (0 until 500).foreach { _ =>
      val s = randomString(24)
      val w = 1 + rnd.nextInt(20)
      Bounds.truncateUpper(IceString, s, w).map(_.asInstanceOf[String]) match {
        case None => // only when every truncated code point is MAX_CODE_POINT
        case Some(up) =>
          assert(up.codePointCount(0, up.length) <= w)
          assert(Bounds.compare(IceString, s, up) <= 0,
            s"truncateUpper($w) of ${s.codePoints().toArray.toSeq} fell below the value")
          assert(java.util.Arrays.compareUnsigned(utf8(s), utf8(up)) <= 0)
          // no unpaired surrogate may survive into the stored bound (it
          // would UTF-8-encode as '?' and collapse the bound)
          up.codePoints().forEach(cp =>
            assert(cp < Character.MIN_SURROGATE || cp > Character.MAX_SURROGATE))
      }
    }
  }

  test("binary truncate bounds bracket the value in unsigned order (500 cases)") {
    (0 until 500).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(24))
      rnd.nextBytes(b)
      val w = 1 + rnd.nextInt(20)
      val lo = Bounds.truncateLower(IceBinary, b, w).asInstanceOf[Array[Byte]]
      assert(lo.length <= w)
      assert(java.util.Arrays.compareUnsigned(lo, b) <= 0)
      Bounds.truncateUpper(IceBinary, b, w)
        .map(_.asInstanceOf[Array[Byte]]).foreach { up =>
          assert(up.length <= w)
          assert(java.util.Arrays.compareUnsigned(b, up) <= 0)
        }
    }
  }

  test("min/max by Bounds.compare equal min/max by UTF-8 bytes (100 sets)") {
    (0 until 100).foreach { _ =>
      val xs = Seq.fill(2 + rnd.nextInt(20))(randomString(16))
      val byCompare = xs.reduceLeft((a, b) =>
        if (Bounds.compare(IceString, a, b) <= 0) a else b)
      val byBytes = xs.reduceLeft((a, b) =>
        if (java.util.Arrays.compareUnsigned(utf8(a), utf8(b)) <= 0) a else b)
      assert(byCompare == byBytes)
      val maxCompare = xs.reduceLeft((a, b) =>
        if (Bounds.compare(IceString, a, b) >= 0) a else b)
      val maxBytes = xs.reduceLeft((a, b) =>
        if (java.util.Arrays.compareUnsigned(utf8(a), utf8(b)) >= 0) a else b)
      assert(maxCompare == maxBytes)
    }
  }
}

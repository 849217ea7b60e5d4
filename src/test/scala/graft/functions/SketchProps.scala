package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck invariants for the round-12 sketch kernels — randomized
  * structural laws that the fixture-driven SketchParitySpec equivalence
  * tests don't sweep: window-count arithmetic, entropy bounds and
  * self-similarity laws, bigram-count arithmetic. Run by sbt's native
  * ScalaCheck framework (same harness as CsvCodecProps).
  */
object SketchProps extends Properties("Sketches") {

  private val W = Sketches.SPAN_W
  private val S = Sketches.SPAN_S

  private def u8(s: String): UTF8String = UTF8String.fromString(s)

  // ASCII-ish text with spaces: the population the kernels see after
  // whatever upstream normalization; includes empty and repeated tokens.
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.const(' '))).map(_.mkString)

  property("spanHashes count = (n-W)/S + 1 for n >= W, null below one window") =
    Prop.forAll(textGen) { s =>
      val out = Sketches.spanHashes(u8(s))
      val n = s.toLowerCase.codePointCount(0, s.toLowerCase.length)
      if (n < W) out == null
      else out.numElements() == (n - W) / S + 1
    }

  property("spanHashes is case-insensitive (lowercase normalization)") =
    Prop.forAll(textGen) { s =>
      val a = Sketches.spanHashes(u8(s))
      val b = Sketches.spanHashes(u8(s.toUpperCase))
      (a == null && b == null) ||
        (a != null && b != null && a.toLongArray.toSeq == b.toLongArray.toSeq)
    }

  property("charEntropy within [0, log2(distinct)] and 0 iff <= 1 distinct char") =
    Prop.forAll(textGen) { s =>
      val h = Sketches.charEntropy(u8(s))
      val distinct = s.codePoints().distinct().count()
      val bound = if (distinct == 0) 0.0 else math.log(distinct.toDouble) / math.log(2.0)
      h >= -1e-12 && h <= bound + 1e-9 &&
        (distinct > 1 || math.abs(h) < 1e-12)
    }

  property("charEntropy is self-similar: H(s ++ s) = H(s)") =
    Prop.forAll(textGen.suchThat(_.nonEmpty)) { s =>
      math.abs(Sketches.charEntropy(u8(s + s)) - Sketches.charEntropy(u8(s))) < 1e-9
    }

  property("charEntropy is permutation-invariant up to float associativity") =
    Prop.forAll(textGen.suchThat(_.length > 1)) { s =>
      val shuffled = new String(s.toCharArray.sorted)
      math.abs(Sketches.charEntropy(u8(shuffled)) - Sketches.charEntropy(u8(s))) < 1e-9
    }

  property("bigramHashes count = tokens - 1 for >= 2 tokens, null below") =
    Prop.forAll(textGen) { s =>
      val out = Sketches.bigramHashes(u8(s))
      val nTok = s.toLowerCase.split(" ", -1).length
      if (nTok < 2) out == null else out.numElements() == nTok - 1
    }

  property("bigramHashes prefix hash at i equals span-free word hash of token i") =
    Prop.forAll(textGen) { s =>
      val toks = s.toLowerCase.split(" ", -1)
      toks.length < 2 || {
        val out = Sketches.bigramHashes(u8(s))
        (0 until out.numElements()).forall { i =>
          out.getStruct(i, 2).getLong(0) ==
            Sketches.md5Prefix60(toks(i).getBytes("UTF-8"))
        }
      }
    }
}

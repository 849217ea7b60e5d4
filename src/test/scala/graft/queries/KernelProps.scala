package graft.queries

import org.scalacheck.{Gen, Prop, Properties}

import graft.pipeline.Multimodal

/** ScalaCheck laws for the round-16/17 kernels (VERDICT r16 #8 / r17
  * #7) — randomized structural invariants the fixture-driven specs
  * don't sweep:
  *
  *   - q229's squaring-chain collision probability (the REAL
  *     [[PipelineDedup.lshCollisionP]] function): bounded [0, 1],
  *     monotone in similarity, exact at the endpoints;
  *   - q216's SQ8 quantization rule: codes bounded at ±127, per-element
  *     reconstruction error bounded by scale/254 (the scale-cancellation
  *     bound behind "codes rank like vectors");
  *   - q230's consistent-sampling append-stability law over the SHARED
  *     production hash ([[graft.functions.Sketches.md5Prefix60]]): a
  *     doc's keep/drop decision never changes when the corpus grows;
  *   - the q238 WAV contract: [[Multimodal.isqrt]] is the exact floor
  *     sqrt on arbitrary non-negative longs (incl. the r17-ADVICE
  *     overflow region near Long.MaxValue), and
  *     decodePcm16 ∘ wavBytes is the identity on arbitrary PCM16 frames
  *     (the round trip is genuine and lossless, not a formula replay).
  */
object KernelProps extends Properties("Kernels") {

  // ---- q229: LSH S-curve planner ------------------------------------

  private val simGen = Gen.chooseNum(0.0, 1.0)
  private val kGen = Gen.chooseNum(1, 8)

  property("lshCollisionP is bounded in [0, 1]") =
    Prop.forAll(kGen, kGen, simGen) { (kb, kr, s) =>
      val p = PipelineDedup.lshCollisionP(kb, kr, s)
      p >= 0.0 && p <= 1.0
    }

  property("lshCollisionP is monotone non-decreasing in similarity") =
    Prop.forAll(kGen, kGen, simGen, simGen) { (kb, kr, s1, s2) =>
      val (lo, hi) = if (s1 <= s2) (s1, s2) else (s2, s1)
      PipelineDedup.lshCollisionP(kb, kr, lo) <=
        PipelineDedup.lshCollisionP(kb, kr, hi)
    }

  property("lshCollisionP is exact at the endpoints: P(0) = 0, P(1) = 1") =
    Prop.forAll(kGen, kGen) { (kb, kr) =>
      PipelineDedup.lshCollisionP(kb, kr, 0.0) == 0.0 &&
        PipelineDedup.lshCollisionP(kb, kr, 1.0) == 1.0
    }

  // ---- q216: SQ8 scalar quantization ---------------------------------
  // The rule both engines compute: scale = max |v_i|; code_i =
  // round(v_i / scale * 127) (codes 0 when scale = 0).

  private val vecGen: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).map(_.toArray)

  private def sq8(v: Array[Double]): (Double, Array[Long]) = {
    val scale = v.map(math.abs).max
    (scale,
      if (scale > 0) v.map(x => math.round(x / scale * 127)) else v.map(_ => 0L))
  }

  property("sq8 codes are bounded at ±127") =
    Prop.forAll(vecGen) { v =>
      sq8(v)._2.forall(c => c >= -127 && c <= 127)
    }

  property("sq8 reconstruction error per element is <= scale/254 (+1 ulp)") =
    Prop.forAll(vecGen) { v =>
      val (scale, codes) = sq8(v)
      scale == 0.0 || v.zip(codes).forall { case (x, c) =>
        math.abs(c * scale / 127.0 - x) <= scale / 254.0 * (1 + 1e-12)
      }
    }

  // ---- q230: consistent sampling -------------------------------------
  // The keep decision is a pure function of the doc's own hash (the
  // production 60-bit md5 kernel) vs a fixed threshold — so growing the
  // corpus can NEVER flip an existing doc's decision. This is the law
  // that makes hash-threshold sampling append-stable where
  // proportional-budget ranking churns (q230's measured contrast).

  private def kept(id: Long, thresholdMicro: Long): Boolean =
    graft.functions.Sketches.md5Prefix60(
      id.toString.getBytes("UTF-8")) % 1000000L < thresholdMicro

  property("consistent sampling is append-stable: decisions never change when the corpus grows") =
    Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, 100000L)),
      Gen.listOf(Gen.chooseNum(0L, 100000L)),
      Gen.chooseNum(0L, 1000000L)) { (a, extra, th) =>
      val before = a.toSet.filter(kept(_, th))
      val after = (a.toSet ++ extra.toSet).filter(kept(_, th))
      (after intersect a.toSet) == before
    }

  // ---- q238: the WAV contract ----------------------------------------

  property("isqrt is the exact floor sqrt on arbitrary non-negative longs") =
    Prop.forAll(Gen.oneOf(
      Gen.chooseNum(0L, 10000000L),
      Gen.chooseNum(0L, Long.MaxValue), // incl. the r17-ADVICE overflow region
      Gen.chooseNum(Long.MaxValue - 10000000L, Long.MaxValue))) { x =>
      val r = Multimodal.isqrt(x)
      val rr = BigInt(r) * BigInt(r)
      val r1 = (BigInt(r) + 1) * (BigInt(r) + 1)
      r >= 0 && rr <= BigInt(x) && r1 > BigInt(x)
    }

  property("decodePcm16 ∘ wavBytes is the identity on arbitrary PCM16 frames") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767)),
      Gen.oneOf(8000, 16000, 44100)) { (samples, rate) =>
      val arr = samples.toArray
      Multimodal.decodePcm16(Multimodal.wavBytes(arr, rate))
        .exists(_.sameElements(arr))
    }
}

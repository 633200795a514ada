package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.imagecodec.ImageCodec

class ImageCodecSpec extends AnyFunSuite {

  // deterministic property-style sampling (scalatestplus is not in the
  // offline cache, so we drive cases from the codec's own mixer)
  private val dims = Seq(8, 16, 32, 64)
  private def cases: Seq[(Long, Int, Int)] =
    (0 until 100).map { i =>
      val s = ImageCodec.mix64(0xabcdefL + i)
      (s, dims((i % 4)), dims((i / 4) % 4))
    }

  test("bmp and png round-trip bit-exactly") {
    cases.foreach { case (seed, w, h) =>
      val px = ImageCodec.syntheticPixels(seed, w, h)
      for (fmt <- Seq("bmp", "png")) {
        val (dec, dw, dh) = ImageCodec.decode(ImageCodec.encode(px, w, h, fmt))
        assert(dw == w && dh == h)
        assert(java.util.Arrays.equals(dec, px), s"fmt=$fmt seed=$seed ${w}x$h")
      }
    }
  }

  test("xjpg lossy round-trip satisfies PSNR >= 40dB (BASELINE.json invariant)") {
    cases.foreach { case (seed, w, h) =>
      val px = ImageCodec.syntheticPixels(seed, w, h)
      val (dec, _, _) = ImageCodec.decode(ImageCodec.encode(px, w, h, "xjpg"))
      val p = ImageCodec.psnr(px, dec)
      assert(p >= 40.0, s"psnr=$p for seed=$seed ${w}x$h")
    }
  }

  test("psnr is +inf on identical input and symmetric") {
    val px = ImageCodec.syntheticPixels(1L, 16, 16)
    assert(ImageCodec.psnr(px, px).isPosInfinity)
    val px2 = ImageCodec.syntheticPixels(2L, 16, 16)
    assert(ImageCodec.psnr(px, px2) == ImageCodec.psnr(px2, px))
  }

  test("sniffFormat identifies all three formats; header-only dims are exact") {
    for (fmt <- Seq("bmp", "png", "xjpg")) {
      val enc = ImageCodec.encode(ImageCodec.syntheticPixels(7L, 32, 16), 32, 16, fmt)
      assert(ImageCodec.sniffFormat(enc) == fmt)
      assert(ImageCodec.decodeDims(enc) == ((32, 16)))
    }
  }

  test("synthetic dup injection: rows 24 and 49 share pixels and phash") {
    import graft.model.Synth
    assert(Synth.pixelSeedOf(49) == Synth.pixelSeedOf(24))
    val pxA = ImageCodec.syntheticPixels(Synth.pixelSeedOf(24), 16, 16)
    val pxB = ImageCodec.syntheticPixels(Synth.pixelSeedOf(49), 16, 16)
    assert(java.util.Arrays.equals(pxA, pxB))
    assert(ImageCodec.averageHash(pxA, 16, 16) == ImageCodec.averageHash(pxB, 16, 16))
  }

  test("xjpg decode differs from original (lossiness is real, not a tautology)") {
    val px = ImageCodec.syntheticPixels(3L, 32, 32)
    val (dec, _, _) = ImageCodec.decode(ImageCodec.encode(px, 32, 32, "xjpg"))
    assert(!java.util.Arrays.equals(dec, px))
  }

  test("phash distinguishes structurally different images (not constant)") {
    val hashes = cases.take(20).map { case (seed, w, h) =>
      ImageCodec.averageHash(ImageCodec.syntheticPixels(seed, w, h), w, h)
    }
    assert(hashes.distinct.size > 10)
  }
}

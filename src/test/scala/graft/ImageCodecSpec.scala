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

  test("dihedral hash is invariant over the full rotation/mirror orbit, non-square included") {
    cases.foreach { case (seed, w, h) =>
      val px = ImageCodec.syntheticPixels(seed, w, h)
      val base = ImageCodec.dihedralMinHash(px, w, h)
      // the 4 rotations
      var cur = px; var cw = w; var ch = h
      (0 until 3).foreach { _ =>
        cur = ImageCodec.rotate90(cur, cw, ch); val t = cw; cw = ch; ch = t
        assert(ImageCodec.dihedralMinHash(cur, cw, ch) == base, s"rot orbit broke at ${cw}x$ch")
      }
      // the 4 mirrored rotations
      cur = ImageCodec.flipHoriz(px, w, h); cw = w; ch = h
      assert(ImageCodec.dihedralMinHash(cur, cw, ch) == base)
      (0 until 3).foreach { _ =>
        cur = ImageCodec.rotate90(cur, cw, ch); val t = cw; cw = ch; ch = t
        assert(ImageCodec.dihedralMinHash(cur, cw, ch) == base, s"mirror orbit broke at ${cw}x$ch")
      }
    }
  }

  test("rotate90 composes to identity after 4 turns; flipHoriz is an involution") {
    cases.take(20).foreach { case (seed, w, h) =>
      val px = ImageCodec.syntheticPixels(seed, w, h)
      val r4 = ImageCodec.rotate90(ImageCodec.rotate90(
        ImageCodec.rotate90(ImageCodec.rotate90(px, w, h), h, w), w, h), h, w)
      assert(r4.toSeq == px.toSeq, s"rot^4 != id at ${w}x$h")
      assert(ImageCodec.flipHoriz(ImageCodec.flipHoriz(px, w, h), w, h).toSeq == px.toSeq)
    }
  }

  test("dihedral hash separates different patterns and survives the lossless re-encode path") {
    // the d18 planting path: PNG re-encode of the rotated DECODED pixels
    // must land in the source's orbit exactly, for every source format
    Seq("bmp", "png", "xjpg").foreach { fmt =>
      val px = ImageCodec.syntheticPixels(0x77aaL, 32, 16)
      val src = ImageCodec.encode(px, 32, 16, fmt)
      val (dpx, w, h) = ImageCodec.decode(src) // xjpg: quantized pixels
      val planted = ImageCodec.encode(ImageCodec.rotate90(dpx, w, h), h, w, "png")
      assert(ImageCodec.phashD4OfEncoded(planted) == ImageCodec.phashD4OfEncoded(src),
        s"orbit equality broke for source fmt $fmt")
    }
    // not constant: structurally different images get different values
    // (seeds MIXED like the fixture's pixelSeedOf — raw small seeds
    // produce near-identical synthetic patterns by construction)
    val a = ImageCodec.dihedralMinHash(
      ImageCodec.syntheticPixels(ImageCodec.mix64(1L), 32, 32), 32, 32)
    val b = ImageCodec.dihedralMinHash(
      ImageCodec.syntheticPixels(ImageCodec.mix64(2L), 32, 32), 32, 32)
    assert(a != b)
  }

  test("phash distinguishes structurally different images (not constant)") {
    val hashes = cases.take(20).map { case (seed, w, h) =>
      ImageCodec.averageHash(ImageCodec.syntheticPixels(seed, w, h), w, h)
    }
    assert(hashes.distinct.size > 10)
  }
}

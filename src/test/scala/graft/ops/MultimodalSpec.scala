package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The image decode path is REAL (JDK ImageIO): a known image must decode
  * to known features, the synthetic PNG must round-trip bit-exactly to its
  * generation formula, and non-image bytes must take the byte-histogram
  * fallback. All JVM-local — no Spark session needed; the distributed
  * plan is gated by the multimodal_decode oracle row.
  */
final class MultimodalSpec extends AnyFunSuite {

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("a known two-pixel image decodes to known luminance features") {
    // pixel (0,0) black → lum 0 → bin 0; pixel (1,0) white → lum 255 → bin 15
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xffffff)
    val feats = Multimodal.decodeToFeatures(png(img), "png")
    assert(feats.length == Multimodal.FeatureDim)
    assert(feats(0) == 0.5f && feats(15) == 0.5f)
    assert(feats.sum == 1.0f)
    // mid-gray lands mid-histogram: lum 128 → bin 8
    val gray = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    gray.setRGB(0, 0, 0x808080)
    assert(Multimodal.decodeToFeatures(png(gray), "png")(8) == 1.0f)
  }

  test("synthetic PNG round-trips bit-exactly to the generation formula") {
    val d = 42L
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(d)).get
    assert(img.getWidth == Multimodal.ImgSide && img.getHeight == Multimodal.ImgSide)
    for (y <- 0 until Multimodal.ImgSide; x <- 0 until Multimodal.ImgSide) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == ((d * 31 + x * 7 + y * 13) % 256).toInt)
      assert(((rgb >> 8) & 0xff) == ((d * 17 + x * 3 + y * 5) % 256).toInt)
      assert((rgb & 0xff) == ((d * 29 + x * 11 + y * 3) % 256).toInt)
    }
    // and the histogram of the decoded image counts every pixel exactly once
    assert(Multimodal.lumaHistogram(img).sum == 1L * Multimodal.ImgSide * Multimodal.ImgSide)
  }

  test("non-image bytes fall back to the byte histogram for image formats") {
    val bytes = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.decodeToFeatures(bytes, "png")
      .sameElements(Multimodal.byteHistogram(bytes)))
    // non-image formats always take the fallback, decodable or not
    val realPng = Multimodal.syntheticPng(7L)
    assert(Multimodal.decodeToFeatures(realPng, "wav")
      .sameElements(Multimodal.byteHistogram(realPng)))
  }
}

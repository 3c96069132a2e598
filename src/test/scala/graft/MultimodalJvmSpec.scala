package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** The REAL JVM codec stages (ImageIO decode, aHash fingerprint,
  * bilinear resize) on PNGs generated in-test — no fixtures, no
  * external codec dependencies. */
class MultimodalJvmSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val buf = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaDf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.toDF("media_id", "bytes")
  }

  test("decode_real_png_dimensions_channels_luma") {
    val red = png(16, 12)((_, _) => 0xff0000) // luma = 255*299/1000
    val grey = png(4, 4)((_, _) => 0x808080)  // luma = 128
    val junk = Array[Byte](1, 2, 3, 4)
    val out = MultimodalOps.decodeImage(mediaDf((1L, red), (2L, grey), (3L, junk)))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))))
      .toMap
    assert(out(1L) == ((true, 16, 12, 3, 255 * 299 / 1000.0)))
    assert(out(2L) == ((true, 4, 4, 3, 128 * (299 + 587 + 114) / 1000.0)))
    // undecodable bytes are contained per-row, not thrown
    assert(out(3L) == ((false, 0, 0, 0, 0.0)))
  }

  test("ahash_identical_images_equal_and_patterns_differ") {
    // left-black / right-white: exactly the right 4 cell-columns set
    val split = png(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val splitDup = png(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val inverse = png(64, 64)((x, _) => if (x < 32) 0xffffff else 0x000000)
    val out = MultimodalOps.imageAHash(
      mediaDf((1L, split), (2L, splitDup), (3L, inverse), (4L, Array[Byte](9))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectSplit = (0 until 8).map(cy => (4 until 8)
      .map(cx => 1L << (cy * 8 + cx)).sum).sum
    assert(out(1L) == expectSplit)
    assert(out(1L) == out(2L), "identical pixels must hash identically")
    assert(out(3L) == ~expectSplit, "inverse pattern sets the complementary bits")
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) == 64,
      "opposite halves differ in every cell")
    assert(!out.contains(4L), "undecodable rows are dropped")
  }

  test("resize_halves_dimensions_and_never_upscales") {
    val big = png(100, 50)((x, y) => if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val small = png(10, 10)((_, _) => 0x123456)
    val resized = MultimodalOps.resizeImages(
      mediaDf((1L, big), (2L, small), (3L, Array[Byte](7))), 50, 50)
    val rows = resized.collect()
      .map(r => r.getLong(0) -> ((r.getAs[Array[Byte]](1), r.getBoolean(2)))).toMap
    // decode the resized output to confirm real dimensions
    val dims = MultimodalOps.decodeImage(
      mediaDf((1L, rows(1L)._1), (2L, rows(2L)._1)))
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(dims(1L) == ((50, 25)), "aspect-preserving downscale")
    assert(dims(2L) == ((10, 10)), "no upscale")
    assert(rows(2L)._1.sameElements(small), "small image passes through byte-identical")
    assert(rows(3L)._2 == false && rows(3L)._1.sameElements(Array[Byte](7)),
      "undecodable bytes pass through unchanged")
  }

  test("ahash_hamming_band_join_finds_image_near_dups") {
    // near-dup: one corner cell brightened -> hamming distance 1;
    // far: inverse pattern -> distance 64
    val base = png(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val nearDup = png(64, 64)((x, y) =>
      if (x < 8 && y < 8) 0xffffff else if (x < 32) 0x000000 else 0xffffff)
    val far = png(64, 64)((x, _) => if (x < 32) 0xffffff else 0x000000)
    val hashes = MultimodalOps.imageAHash(
      mediaDf((1L, base), (2L, nearDup), (3L, far)))
    // 4x16-bit bands (the q27 SimHash shape): candidates collide on >=1 band
    val banded = hashes.select(col("media_id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "key")))
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "key"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), "1-bit-different images must band-collide")
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)),
      "all-bits-different images must not collide on any band")
  }
}

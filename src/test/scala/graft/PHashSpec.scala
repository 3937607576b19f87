package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.functions.Media
import graft.queries.{MultimodalOps, NearDupOps}

/** The REAL pixel path of q158's perceptual-hash dedup (testdata
  * ships no image fixtures, so the oracle surface runs the documented
  * fake decode — THIS spec pins the ImageIO path on crafted images):
  *
  *  - resize / recompress ROBUSTNESS: nearest-neighbor upscales,
  *    [[Media.imageIoResizer]] thumbnails and JPEG recompression of
  *    one image all land within Hamming ≤ 3 of the original dHash;
  *  - DISTINCT images land far apart (no false banded pairs);
  *  - the banded 4×16 multi-index ([[NearDupOps.bandedHammingPairs]])
  *    equals the brute-force all-pairs Hamming≤3 scan — the
  *    pigeonhole guarantee on real image hashes;
  *  - the column gradient formulation behind the q158 oracle
  *    ([[MultimodalOps.gradientHalf]]) is bit-identical to the Scala
  *    kernel ([[Media.dHash64FromGrid]]) on the same grid — the
  *    fake-decode surface and the pixel path share one fingerprint.
  */
class PHashSpec extends SparkSpec {
  import spark.implicits._

  /** Smooth blocky test pattern: 8-pixel constant cells whose level
    * walks with the seed — low-frequency content survives both the
    * JPEG 8×8 DCT and area-average downsampling, which is what dHash
    * robustness is about.
    */
  private def pattern(seed: Int, size: Int = 64): BufferedImage = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        // seed enters the GRADIENT structure, not just the offset —
        // dHash is invariant to constant brightness shifts by design,
        // so an offset-only family would collide across seeds
        val (bx, by) = (x / 8, y / 8)
        val g = (bx * (11 + 3 * seed) + by * (7 + 5 * seed) +
          bx * by * (1 + seed % 4)) % 200 + 20
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def jpg(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("dHash is stable under resize and recompression, distinct images stay apart") {
    val base = pattern(3)
    val h0 = Media.dHash64(png(base))
    // nearest-neighbor upscale, thumbnail via the real resizer, JPEG
    val up = Media.dHash64(png(Media.nearestNeighbor(base, 128, 128)))
    val thumb = Media.dHash64(Media.imageIoResizer.resize(png(base), 32, 32))
    val jpeg = Media.dHash64(jpg(base))
    assert(hamming(h0, up) <= 3, s"upscale drifted: ${hamming(h0, up)}")
    assert(hamming(h0, thumb) <= 3, s"thumbnail drifted: ${hamming(h0, thumb)}")
    assert(hamming(h0, jpeg) <= 3, s"jpeg drifted: ${hamming(h0, jpeg)}")
    // distinct seeds stay far from the base and from each other
    val others = (10 to 21).map(s => Media.dHash64(png(pattern(s))))
    for (h <- others) assert(hamming(h0, h) > 3)
    for (Seq(a, b) <- others.combinations(2))
      assert(hamming(a, b) > 3, s"seeds collided at ${hamming(a, b)}")
  }

  test("banded Hamming index equals brute force on real image hashes") {
    // corpus: 3 originals, each with 2 variants, plus 9 distinct
    val assets: Seq[(String, Array[Byte])] =
      (1 to 3).flatMap { s =>
        val img = pattern(s)
        Seq(s"base$s.png" -> png(img),
          s"up$s.png" -> png(Media.nearestNeighbor(img, 96, 96)),
          s"jpg$s.jpg" -> jpg(img))
      } ++ (30 to 38).map(s => s"lone$s.png" -> png(pattern(s)))
    val files = assets.toDF("path", "content")
    val hashes = Media.imageHashes(files).collect()
    assert(hashes.length === assets.length) // all decodable
    val byName = hashes.map(h => h.file_name -> ((h.hi << 32) | h.lo)).toMap
    val ids = assets.map(_._1).sorted.zipWithIndex.toMap
    val fp = hashes.toSeq
      .map(h => (ids(h.file_name).toLong, h.hi, h.lo))
      .toDF("doc_id", "hi", "lo")
      .select(col("doc_id"), struct(col("hi"), col("lo")).as("sh"))
    val banded = NearDupOps.bandedHammingPairs(fp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      Seq((na, ha), (nb, hb)) <- byName.toSeq.sortBy(_._1).combinations(2)
      d = hamming(ha, hb) if d <= 3
    } yield {
      val (ia, ib) = (ids(na).toLong, ids(nb).toLong)
      (math.min(ia, ib), math.max(ia, ib), d)
    }).toSet
    assert(banded === brute)
    // the three variant families pair up; no cross-family pair
    def id(n: String) = ids(n).toLong
    for (s <- 1 to 3) {
      val fam = Seq(s"base$s.png", s"up$s.png", s"jpg$s.jpg").map(id).sorted
      for (Seq(a, b) <- fam.combinations(2))
        assert(banded.exists(p => p._1 == a && p._2 == b),
          s"family $s pair ($a,$b) missing")
    }
    assert(banded.forall { case (a, b, _) =>
      val fam = (x: Long) => assets.map(_._1).sorted.apply(x.toInt).replaceAll("[a-z.]+", "")
      fam(a) == fam(b)
    })
  }

  test("native PHash64 kernel == the HOF formulation on the fixture corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = MultimodalOps.phashFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val hof = MultimodalOps.phashFingerprintsHof(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(native === hof)
    assert(native.nonEmpty)
  }

  test("column gradient formulation == Scala dHash kernel on one grid") {
    // a deterministic non-trivial 9×8 grid
    val grid = Array.tabulate(72)(i => ((i * 2654435761L) % 97L))
    val expected = Media.dHash64FromGrid(grid)
    val row = Seq(Tuple1(grid.toSeq)).toDF("cells")
      .select(MultimodalOps.gradientHalf(col("cells"), 0).as("hi"),
        MultimodalOps.gradientHalf(col("cells"), 4).as("lo"))
      .head()
    val got = (row.getLong(0) << 32) | row.getLong(1)
    assert(got === expected)
  }
}

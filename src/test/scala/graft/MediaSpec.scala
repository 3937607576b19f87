package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.expressions.MediaDims
import graft.functions.Media
import graft.queries.Registry

/** Pins the multimodal pipeline: REAL header decode (media_dims —
  * kind/width/height/n_frames parsed from actual format headers),
  * schema, determinism, partition-parallel shape. The remaining seam
  * is the feature model (pseudo-embedding), and these tests are what
  * stays true when a codec+model decoder is plugged in.
  */
class MediaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def files = spark.read.format("binaryFile")
    .option("pathGlobFilter", "*.parquet").load(dir)

  // ---- crafted real-format headers (valid prefixes, not full codecs) ----

  private def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def s2b(s: String) = s.getBytes("US-ASCII")

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private def pngChunk(typ: String, data: Array[Byte]) =
    cat(be32(data.length), s2b(typ), data, be32(0)) // crc not validated
  private def png(w: Int, h: Int) = cat(pngSig,
    pngChunk("IHDR", cat(be32(w), be32(h), Array[Byte](8, 6, 0, 0, 0))))
  private def apng(w: Int, h: Int, frames: Int) = cat(pngSig,
    pngChunk("IHDR", cat(be32(w), be32(h), Array[Byte](8, 6, 0, 0, 0))),
    pngChunk("acTL", cat(be32(frames), be32(0))),
    pngChunk("IDAT", Array[Byte](0)))

  private def jpegSof(w: Int, h: Int, sof: Int = 0xc0) = cat(
    Array[Byte](0xff.toByte, 0xd8.toByte),
    Array[Byte](0xff.toByte, 0xe0.toByte), be16(16), s2b("JFIF"),
    Array[Byte](0, 1, 1, 0), be16(72), be16(72), Array[Byte](0, 0),
    Array[Byte](0xff.toByte, sof.toByte), be16(17),
    Array[Byte](8), be16(h), be16(w),
    Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))

  private def gif(w: Int, h: Int, frames: Int) = {
    val imageDesc = cat(Array[Byte](0x2c), le16(0), le16(0), le16(w), le16(h),
      Array[Byte](0), // no local color table
      Array[Byte](2), // LZW min code size
      Array[Byte](1, 0x44, 0)) // one 1-byte data sub-block + terminator
    cat(s2b("GIF89a"), le16(w), le16(h), Array[Byte](0, 0, 0), // no GCT
      cat(Seq.fill(frames)(imageDesc): _*), Array[Byte](0x3b))
  }

  private def bmp(w: Int, h: Int) = cat(s2b("BM"), le32(54 + 16), le32(0), le32(54),
    le32(40), le32(w), le32(h), le16(1), le16(24), le32(0), le32(16),
    le32(2835), le32(2835), le32(0), le32(0))

  private def webpLossless(w: Int, h: Int) = {
    val bits = (w - 1) | ((h - 1) << 14) // 14-bit w-1, 14-bit h-1
    cat(s2b("RIFF"), le32(20), s2b("WEBP"), s2b("VP8L"), le32(9),
      Array[Byte](0x2f), le32(bits), Array[Byte](0))
  }

  private val wav = cat(s2b("RIFF"), le32(36), s2b("WAVE"), s2b("fmt "), le32(16),
    Array.fill[Byte](16)(0))

  /** WAV with a real fmt (16-bit stereo, blockAlign bytes/frame) and
    * a data chunk of `dataSize` bytes — n_frames = dataSize/blockAlign.
    * `payload` defaults to the declared size (a real file carries its
    * samples); pass less to model a lying/streaming header.
    */
  private def wavFull(blockAlign: Int, dataSize: Int,
                      payload: Int = -1) = cat(
    s2b("RIFF"), le32(36 + dataSize), s2b("WAVE"),
    s2b("fmt "), le32(16),
    cat(Array[Byte](1, 0, 2, 0), le32(44100), le32(44100 * blockAlign),
      Array[Byte]((blockAlign & 0xff).toByte,
        ((blockAlign >> 8) & 0xff).toByte, 16, 0)),
    s2b("data"), le32(dataSize),
    new Array[Byte](if (payload < 0) dataSize else payload))

  /** Minimal ISO-BMFF: ftyp + moov{ trak(audio 0x0){tkhd}, trak(video){tkhd} }
    * — the audio trak first proves the walk skips zero-dim traks.
    */
  private def mp4(w: Int, h: Int, version: Int = 0,
                  frames: Int = -1, via: String = "stsz") = {
    def box(typ: String, payload: Array[Byte]) =
      cat(be32(8 + payload.length), s2b(typ), payload)
    def tkhd(tw: Int, th: Int) = {
      val pre = if (version == 1) 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4
      box("tkhd", cat(Array[Byte](version.toByte, 0, 0, 0),
        Array.fill[Byte](pre + 8 + 2 + 2 + 2 + 2 + 36)(0),
        be32(tw << 16), be32(th << 16)))
    }
    // sample table: stsz carries the count directly; stts as two
    // (count, delta) runs summing to it (the fallback path)
    def stbl = box("stbl",
      if (via == "stsz") box("stsz", cat(be32(0), be32(0), be32(frames)))
      else box("stts", cat(be32(0), be32(2),
        be32(1), be32(100), be32(frames - 1), be32(50))))
    def videoTrak =
      if (frames < 0) box("trak", tkhd(w, h))
      else box("trak", cat(tkhd(w, h),
        box("mdia", box("minf", stbl))))
    cat(box("ftyp", cat(s2b("isom"), be32(512))),
      box("moov", cat(
        box("trak", tkhd(0, 0)),      // audio trak: 0x0 dims
        videoTrak)))
  }

  test("media_dims parses real PNG / JPEG / GIF / BMP / WebP headers") {
    def p(b: Array[Byte]) = MediaDims.parse(b)
    assert(p(png(640, 480)) === MediaDims.Parsed("png", 640, 480, 1))
    assert(p(apng(1920, 1080, 12)) === MediaDims.Parsed("png", 1920, 1080, 12))
    assert(p(jpegSof(800, 600)) === MediaDims.Parsed("jpeg", 800, 600, 1))
    // progressive JPEG uses SOF2; baseline-extended SOF1
    assert(p(jpegSof(320, 240, sof = 0xc2)) === MediaDims.Parsed("jpeg", 320, 240, 1))
    assert(p(jpegSof(64, 32, sof = 0xc1)) === MediaDims.Parsed("jpeg", 64, 32, 1))
    assert(p(gif(101, 55, frames = 1)) === MediaDims.Parsed("gif", 101, 55, 1))
    assert(p(gif(16, 16, frames = 7)) === MediaDims.Parsed("gif", 16, 16, 7))
    assert(p(bmp(1024, 768)) === MediaDims.Parsed("bmp", 1024, 768, 1))
    assert(p(webpLossless(100, 50)) === MediaDims.Parsed("webp", 100, 50, 1))
    assert(p(wav) === MediaDims.Parsed("wav", -1, -1, -1))
    // audio sample-frame count from fmt.blockAlign + data size — the
    // k-of-n sampling n for audio, header arithmetic only
    assert(p(wavFull(4, 4000)) === MediaDims.Parsed("wav", -1, -1, 1000))
    assert(p(wavFull(4, 0)) === MediaDims.Parsed("wav", -1, -1, 0))
    // lying data headers degrade to null frames, never a bogus n: a
    // declared size beyond the in-buffer payload (truncated file) and
    // the 0xFFFFFFFF streaming-placeholder sentinel are both rejected
    assert(p(wavFull(4, 4000, payload = 100)) ===
      MediaDims.Parsed("wav", -1, -1, -1))
    assert(p(wavFull(4, -1, payload = 64)) === // le32(-1) = 0xFFFFFFFF
      MediaDims.Parsed("wav", -1, -1, -1))
    assert(p(mp4(1280, 720)) === MediaDims.Parsed("mp4", 1280, 720, -1))
    assert(p(mp4(640, 360, version = 1)) === MediaDims.Parsed("mp4", 640, 360, -1))
    // video frame count off the sample table: stsz directly, stts
    // (two runs: 1 + 239) as the fallback — the n that makes
    // frameSampleIndices real for video, no codec involved
    assert(p(mp4(1280, 720, frames = 240)) ===
      MediaDims.Parsed("mp4", 1280, 720, 240))
    assert(p(mp4(320, 240, version = 1, frames = 240, via = "stts")) ===
      MediaDims.Parsed("mp4", 320, 240, 240))
    assert(p(mp4(320, 240, frames = 0)) ===
      MediaDims.Parsed("mp4", 320, 240, 0))
    assert(p(s2b("PAR1....")) === MediaDims.Parsed("parquet", -1, -1, -1))
    assert(p(Array[Byte](1, 2, 3)) === MediaDims.Parsed("unknown", -1, -1, -1))
    assert(p(Array.empty[Byte]) === MediaDims.Parsed("unknown", -1, -1, -1))
  }

  test("media_dims never throws on truncated or malformed headers") {
    val wellFormed = Seq(png(640, 480), apng(8, 8, 3), jpegSof(800, 600),
      gif(101, 55, 2), bmp(1024, 768), webpLossless(100, 50), wav,
      mp4(1280, 720), mp4(64, 48, version = 1),
      mp4(1280, 720, frames = 240),
      mp4(64, 48, version = 1, frames = 7, via = "stts"),
      wavFull(4, 4000))
    for (full <- wellFormed; cut <- 0 to full.length) {
      val d = MediaDims.parse(full.take(cut)) // must not throw
      assert(d.kind ne null)
    }
    // dims absent (or well-formed-prefix) once the geometry bytes are cut
    assert(MediaDims.parse(png(640, 480).take(20)).width === -1)
    assert(MediaDims.parse(jpegSof(800, 600).take(21)).width === -1)
  }

  test("media_dims is registered for SQL and runs inside codegen") {
    import spark.implicits._
    org.apache.spark.sql.graftbridge.FunctionRegistration.registerAll(spark)
    val df = Seq(
      ("png", png(12, 34)), ("jpeg", jpegSof(56, 78)), ("gif", gif(9, 9, 3)),
      ("bmp", bmp(44, 33)), ("other", Array[Byte](0, 1, 2)))
      .toDF("tag", "content")
    df.createOrReplaceTempView("media_blobs")
    val rows = spark.sql(
      """SELECT tag, media_dims(content).kind AS kind,
           media_dims(content).width AS w, media_dims(content).height AS h,
           media_dims(content).n_frames AS f
         FROM media_blobs ORDER BY tag""").collect()
    val byTag = rows.map(r => r.getString(0) ->
      (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    assert(byTag("png") === (("png", 12, 34, 1)))
    assert(byTag("jpeg") === (("jpeg", 56, 78, 1)))
    assert(byTag("gif") === (("gif", 9, 9, 3)))
    assert(byTag("bmp") === (("bmp", 44, 33, 1)))
    assert(byTag("other") === (("unknown", -1, -1, -1)))
  }

  test("fitWithin: aspect-preserving, never upscales, clamps to 1px") {
    assert(Media.fitWithin(640, 480, 128, 128) === ((128, 96)))
    assert(Media.fitWithin(480, 640, 128, 128) === ((96, 128)))
    assert(Media.fitWithin(100, 50, 128, 128) === ((100, 50))) // no upscale
    assert(Media.fitWithin(4000, 2, 128, 128) === ((128, 1))) // clamp
    assert(Media.fitWithin(2, 4000, 128, 128) === ((1, 128)))
    // limiting-axis choice: 1000x500 into 100x90 -> width-limited
    assert(Media.fitWithin(1000, 500, 100, 90) === ((100, 50)))
    // ...but into 300x90 -> height-limited
    assert(Media.fitWithin(1000, 500, 300, 90) === ((180, 90)))
    intercept[IllegalArgumentException](Media.fitWithin(0, 10, 5, 5))
  }

  test("resizeAssets: real geometry plumbing, stub pixels, " +
      "geometry-less assets dropped") {
    import spark.implicits._
    val df = Seq(
      ("a/big.png", png(640, 480)),
      ("a/small.gif", gif(9, 9, 3)),
      ("a/audio.bin", Array[Byte](0, 1, 2))) // no pixel geometry
      .toDF("path", "content")
    // header-only fixtures carry no raster, so this test pins the
    // STUB seam explicitly; the real pixel path is pinned below on
    // fully-encoded images
    val out = Media.resizeAssets(df, 128, 128, Media.stubResizer).collect()
      .sortBy(_.file_name)
    assert(out.map(_.file_name).toSeq === Seq("big.png", "small.gif"))
    val big = out(0)
    assert((big.in_w, big.in_h, big.out_w, big.out_h) === ((640, 480, 128, 96)))
    val small = out(1)
    assert((small.out_w, small.out_h) === ((9, 9))) // under the box: untouched
    // stub payload: deterministic, content-addressed, carries geometry
    val thumb = java.nio.ByteBuffer.wrap(big.thumb)
    val magic = new Array[Byte](4); thumb.get(magic)
    assert(new String(magic, "US-ASCII") === "THMB")
    assert(thumb.getInt === 128 && thumb.getInt === 96)
    val again = Media.resizeAssets(df.repartition(3), 128, 128,
        Media.stubResizer).collect()
      .sortBy(_.file_name)
    assert(again(0).thumb.toSeq === big.thumb.toSeq)
  }

  // ---- real pixel path (round 8): JDK ImageIO rasters ----

  /** A deterministic 7×5 gradient raster encoded with the named JDK
    * codec — a REAL image, not a header-only prefix.
    */
  private def realImage(fmt: String, w: Int = 7, h: Int = 5): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 36) << 16) | ((y * 50) << 8) | ((x + y) * 20))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK $fmt writer")
    bos.toByteArray
  }

  test("imageIoResizer: real raster decode, exact output dims, " +
      "deterministic NN pixels, PNG == BMP") {
    import spark.implicits._
    val df = Seq(
      ("a/grad.png", realImage("png")),
      ("a/grad.bmp", realImage("bmp")),
      ("a/headeronly.png", png(640, 480))) // valid header, NO raster body
      .toDF("path", "content")
    val out = Media.resizeAssets(df, 4, 4).collect()
      .map(r => r.file_name -> r).toMap
    // undecodable body dropped, both real rasters kept
    assert(out.keySet === Set("grad.png", "grad.bmp"))
    val p = out("grad.png")
    assert((p.in_w, p.in_h, p.out_w, p.out_h) === ((7, 5, 4, 2)))
    // decode the emitted thumbnail and check every pixel against an
    // INDEPENDENT nearest-neighbor reference over the source gradient
    def pixels(bytes: Array[Byte]): Seq[Int] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y) & 0xffffff
    }
    val expected = for (y <- 0 until 2; x <- 0 until 4) yield {
      val (sx, sy) = (x * 7 / 4, y * 5 / 2)
      (((sx * 36) << 16) | ((sy * 50) << 8) | ((sx + sy) * 20)) & 0xffffff
    }
    assert(pixels(p.thumb) === expected)
    // BMP source decodes to the identical raster -> identical thumb pixels
    assert(pixels(out("grad.bmp").thumb) === expected)
    // deterministic under repartitioning (byte-identical payload)
    val again = Media.resizeAssets(df.repartition(3), 4, 4).collect()
      .map(r => r.file_name -> r).toMap
    assert(again("grad.png").thumb.toSeq === p.thumb.toSeq)
  }

  test("pixelDecode: exact channel statistics on a solid-color raster") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq(("a/solid.png", bos.toByteArray),
      ("a/meta.bin", s2b("PAR1") :+ 0.toByte)) // non-raster: header fallback
      .toDF("path", "content")
    val m = Media.extractFeatures(df, Media.pixelDecode).collect()
      .map(x => x.file_name -> x).toMap
    val f = m("solid.png").feature
    assert(math.abs(f(0) - (200.0 / 255 * 2 - 1)) < 1e-6) // r mean exact
    assert(math.abs(f(1) - (100.0 / 255 * 2 - 1)) < 1e-6) // g mean
    assert(math.abs(f(2) - (50.0 / 255 * 2 - 1)) < 1e-6)  // b mean
    assert(f(4) === -1.0f) // zero luma stddev on a solid color
    assert(f(5) === -1.0f) // zero edge density
    // non-raster asset still yields a total row via the header fallback
    assert(m("meta.bin").kind === "parquet")
    assert(m("meta.bin").feature.length === Media.FeatureDim)
  }

  test("extractFeatures: one typed row per file, fixed feature width") {
    val ds = Media.extractFeatures(files)
    val rows = ds.collect()
    assert(rows.length.toLong === files.count())
    rows.foreach { m =>
      assert(m.feature.length === Media.FeatureDim)
      assert(m.kind === "parquet") // fixture files all carry the PAR1 magic
      assert(m.width.isEmpty && m.height.isEmpty && m.n_frames.isEmpty)
    }
  }

  test("decode is deterministic and partitioning-independent") {
    val a = Media.extractFeatures(files).collect().sortBy(_.file_name)
    val b = Media.extractFeatures(files.repartition(7)).collect().sortBy(_.file_name)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.file_name === y.file_name && x.width === y.width &&
        x.height === y.height && x.feature.toSeq === y.feature.toSeq)
    }
  }

  test("mapPartitions seam preserves partitioning (no repartition/collect)") {
    val parted = files.repartition(5)
    assert(Media.extractFeatures(parted).rdd.getNumPartitions === 5)
  }

  test("kind sniffing reads magic bytes, not file extensions") {
    import spark.implicits._
    val fake = Seq(
      ("a.bin", s2b("PAR1") :+ 9.toByte),
      ("b.parquet", jpegSof(10, 20)),
      ("c.x", png(5, 6)),
      ("d.x", Array[Byte](1, 2, 3))).toDF("path", "content")
    val metas = Media.extractFeatures(fake).collect()
      .map(m => m.file_name -> m).toMap
    assert(metas("a.bin").kind === "parquet")
    assert(metas("b.parquet").kind === "jpeg")
    assert(metas("b.parquet").width === Some(10))
    assert(metas("c.x").kind === "png")
    assert(metas("c.x").height === Some(6))
    assert(metas("d.x").kind === "unknown")
  }

  test("frameSampleIndices: uniform, deterministic, bounded") {
    assert(Media.frameSampleIndices(10, 4) === Seq(0, 2, 5, 7))
    assert(Media.frameSampleIndices(3, 10) === Seq(0, 1, 2)) // k clamped
    assert(Media.frameSampleIndices(0, 5) === Seq.empty)
    assert(Media.frameSampleIndices(240, 8).distinct.size === 8)
    Media.frameSampleIndices(239, 16).foreach(i => assert(i >= 0 && i < 239))
    assert(Media.frameSampleIndices(100, 7).head === 0) // first frame kept
  }

  test("q70/q71 run over the fixture directory") {
    val q70 = Registry.queries("q70_binary_meta")(spark, dir).collect()
    assert(q70.nonEmpty)
    assert(q70.map(_.getString(0)).toSeq === q70.map(_.getString(0)).toSeq.sorted)
    q70.foreach(r => assert(r.getString(2).matches("[0-9a-f]{64}")))
    val q71 = Registry.queries("q71_media_features")(spark, dir).collect()
    assert(q71.length === q70.length)
    q71.foreach { r =>
      assert(r.getString(1) === "parquet")
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }
}

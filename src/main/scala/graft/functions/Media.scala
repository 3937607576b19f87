package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.expressions.MediaDims

/** Multimodal (binary-column) handling — SURVEY §2.9. Media assets
  * are opaque `binary` columns with typed metadata alongside; decode
  * and feature extraction run partition-parallel over the bytes with
  * an iterator-to-iterator transform (bounded memory per task, no
  * driver materialization), which is the Scala analog of a
  * `mapInPandas` batch UDF.
  *
  * The HEADER decode is REAL: [[graft.expressions.MediaDims]] parses
  * container kind, pixel dimensions, and frame count straight from
  * the format headers (PNG/JPEG/GIF/BMP/WebP/WAV/Parquet) with pure
  * byte arithmetic — no codec dependency. The PIXEL path is real too
  * (round 8): `javax.imageio` ships in the JDK, so
  * [[Media.imageIoResizer]] decodes PNG/JPEG/GIF/BMP rasters and
  * resizes by deterministic integer nearest-neighbor sampling, and
  * [[Media.pixelDecode]] computes real image statistics as features.
  * What remains a SEAM is the feature MODEL: an embedding model is
  * out of scope for a query engine, so a deployment swaps its own
  * `Decoder` (ffmpeg bindings, an ONNX encoder, …) without touching
  * the Spark plumbing — schema, partition-parallel batch shape, and
  * the typed seam stay as tested here.
  */
object Media {

  /** Typed decode output: media kind sniffed from magic bytes, header
    * dimensions (None where the format has no pixel geometry or the
    * header is truncated), and a fixed-width feature vector
    * (FeatureDim).
    */
  final case class MediaMeta(
      file_name: String,
      kind: String,
      width: Option[Int],
      height: Option[Int],
      n_frames: Option[Int],
      feature: Array[Float])

  val FeatureDim = 8

  /** Pluggable decoder seam (bytes → typed metadata + features). */
  trait Decoder extends Serializable {
    def decode(path: String, bytes: Array[Byte]): MediaMeta
  }

  /** Default decoder: REAL header parse (kind/width/height/n_frames
    * from [[MediaDims.parse]]) + STUB features (deterministic FNV-1a
    * pseudo-embedding over the content — the model seam; see the
    * object scaladoc). Deterministic across runs and partitionings so
    * the pipeline around it is testable.
    */
  object headerDecode extends Decoder {
    private def fnv(bytes: Array[Byte], seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      h
    }
    private def opt(v: Int): Option[Int] = if (v < 0) None else Some(v)
    override def decode(path: String, bytes: Array[Byte]): MediaMeta = {
      val p = MediaDims.parse(bytes)
      MediaMeta(
        file_name = path.substring(path.lastIndexOf('/') + 1),
        kind = p.kind,
        width = opt(p.width),
        height = opt(p.height),
        n_frames = opt(p.nFrames),
        feature = Array.tabulate(FeatureDim) { i =>
          val f = fnv(bytes, i + 1L)
          (math.floorMod(f, 2000L) - 1000L).toFloat / 1000.0f
        })
    }
  }

  /** REAL featurizer over decoded pixels: for assets the JDK codecs
    * can raster, the feature vector is trivial-but-real image
    * statistics — per-channel means, luma mean/stddev, horizontal
    * edge density (fraction of adjacent pixel pairs with luma delta
    * > 16), aspect ratio, and normalized log-area — each scaled to
    * [-1, 1]. Non-raster kinds (audio, parquet, unknown) fall back to
    * [[headerDecode]]'s content-addressed pseudo-features, so the
    * output stays total. An embedding MODEL stays out of scope for a
    * query engine — this exercises the partition-parallel batch shape
    * on real pixels, which is the part the engine owns.
    */
  object pixelDecode extends Decoder {
    override def decode(path: String, bytes: Array[Byte]): MediaMeta = {
      val base = headerDecode.decode(path, bytes)
      if (base.width.isEmpty || base.height.isEmpty) base
      else try {
        val img = decodeImage(bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sl, sl2) = (0L, 0L, 0L, 0L, 0L)
        var edges = 0L
        var prevLuma = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            // integer BT.601-ish luma — deterministic, no float accum
            val luma = (299 * r + 587 * g + 114 * b) / 1000
            sr += r; sg += g; sb += b; sl += luma; sl2 += luma.toLong * luma
            if (x > 0 && math.abs(luma - prevLuma) > 16) edges += 1
            prevLuma = luma
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = sl.toDouble / n
        val variance = math.max(0.0, sl2.toDouble / n - mean * mean)
        def unit(v: Double): Float = (v * 2 - 1).toFloat // [0,1] -> [-1,1]
        MediaMeta(base.file_name, base.kind, base.width, base.height,
          base.n_frames,
          feature = Array(
            unit(sr.toDouble / n / 255), unit(sg.toDouble / n / 255),
            unit(sb.toDouble / n / 255), unit(mean / 255),
            unit(math.sqrt(variance) / 128),
            unit(if (n > h) edges.toDouble / (n - h) else 0.0),
            unit(math.min(1.0, w.toDouble / (w + h))),
            unit(math.min(1.0, math.log1p(n.toDouble) / 25))))
      } catch { case _: IllegalArgumentException => base } // header lied; keep seam total
    }
  }

  /** Decode + feature-extract a `binaryFile` frame (columns `path`,
    * `content`) partition-parallel. Iterator-to-iterator: one asset's
    * bytes in flight per task at a time; partitioning (and therefore
    * cluster parallelism) is preserved.
    */
  def extractFeatures(files: DataFrame, decoder: Decoder = headerDecode): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, b) => decoder.decode(p, b) })
  }

  /** Aspect-preserving fit of a (w, h) asset inside a maxW×maxH box,
    * never upscaling: the standard thumbnail geometry. Pure integer
    * math (floor of the limiting scale applied to the other axis,
    * clamped ≥ 1), so the plan for a billion assets is computed
    * map-side with zero codec involvement.
    */
  def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0,
      s"non-positive geometry: ${w}x$h in ${maxW}x$maxH")
    if (w <= maxW && h <= maxH) (w, h)
    else {
      // scale = min(maxW/w, maxH/h) applied in long arithmetic:
      // compare cross products instead of dividing
      val byWidth = maxW.toLong * h <= maxH.toLong * w
      val (ow, oh) =
        if (byWidth) (maxW, math.max(1, (maxW.toLong * h / w).toInt))
        else (math.max(1, (maxH.toLong * w / h).toInt), maxH)
      (ow, oh)
    }
  }

  /** Pluggable resize seam (bytes + target geometry → bytes).
    * [[imageIoResizer]] (JDK codecs, real pixels) is the default; a
    * deployment with richer codecs (libvips, ffmpeg) swaps its own in
    * without touching the plumbing. Implementations signal
    * undecodable input with `IllegalArgumentException`.
    */
  trait Resizer extends Serializable {
    def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte]
  }

  /** STUB pixel path: emits a deterministic pseudo-thumbnail (magic +
    * geometry + FNV digest of the source bytes — content-addressed,
    * so identical inputs produce identical outputs under any
    * partitioning) instead of decoded pixels. Kept for formats
    * [[imageIoResizer]] can't raster and as the zero-dependency test
    * double; the REAL pixel path below is the default.
    */
  object stubResizer extends Resizer {
    override def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      val out = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 8)
      out.put("THMB".getBytes("US-ASCII")).putInt(outW).putInt(outH).putLong(h)
      out.array()
    }
  }

  /** REAL pixel path: decode with `javax.imageio` (in the JDK — PNG/
    * JPEG/GIF/BMP/WBMP with no external codec), resize by
    * deterministic integer NEAREST-NEIGHBOR sampling (output pixel
    * (x, y) reads input pixel (x·inW/outW, y·inH/outH) — pure
    * integer floor math, bit-identical on any JVM, unlike Graphics2D
    * interpolation whose rounding is implementation-defined), and
    * re-encode as PNG. Headless-safe; one asset's raster in flight
    * per task. Undecodable bytes (codec-less format, truncated body)
    * throw `IllegalArgumentException` — [[resizeAssets]] maps that to
    * the same drop-with-count semantics as headerless assets.
    */
  object imageIoResizer extends Resizer {
    override def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val img = decodeImage(bytes)
      val out = nearestNeighbor(img, outW, outH)
      val bos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(out, "png", bos))
        throw new IllegalStateException("JDK PNG writer unavailable")
      bos.toByteArray
    }
  }

  /** ImageIO decode with a typed failure. */
  private[graft] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    // ImageIO on corrupt real-world bytes throws beyond IOException:
    // CMMException / IllegalStateException from color management,
    // NegativeArraySizeException from lying headers. All of those
    // mean "this asset is undecodable", not "this executor is
    // broken", so fold every NonFatal into the one typed exception
    // callers treat as a per-asset drop — a single rotten file must
    // not fail the whole partition task. Genuinely environmental
    // failures (e.g. a missing PNG WRITER at re-encode time) happen
    // outside this decode path and stay fatal.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"image decode failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    if (img == null)
      throw new IllegalArgumentException("no ImageIO codec for these bytes")
    img
  }

  /** Deterministic integer nearest-neighbor resample into RGB. */
  private[graft] def nearestNeighbor(img: java.awt.image.BufferedImage,
                                     outW: Int, outH: Int): java.awt.image.BufferedImage = {
    require(outW > 0 && outH > 0, s"non-positive target ${outW}x$outH")
    val (inW, inH) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * inH / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * inW / outW).toInt
        out.setRGB(x, y, img.getRGB(sx, sy) | 0xff000000)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Typed resize output: original + target geometry and the
    * (stub-)resized payload.
    */
  final case class ResizedAsset(
      file_name: String,
      kind: String,
      in_w: Int, in_h: Int,
      out_w: Int, out_h: Int,
      thumb: Array[Byte])

  /** Resize a `binaryFile` frame (columns `path`, `content`) to fit
    * `maxW`×`maxH`, partition-parallel with one asset's bytes in
    * flight per task (the [[extractFeatures]] shape). Assets whose
    * header carries no pixel geometry (audio, parquet, truncated
    * headers) are dropped, as are assets whose BODY the resizer
    * cannot decode (`IllegalArgumentException`) — a thumbnail of an
    * un-decodable asset has no meaning, and at 100 TB silently
    * passing the bytes through would double-store the corpus. Other
    * resizer failures still fail the task: a missing codec for a
    * whole format class should surface, not silently empty the
    * output.
    */
  def resizeAssets(files: DataFrame, maxW: Int, maxH: Int,
                   resizer: Resizer = imageIoResizer): Dataset[ResizedAsset] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) =>
        val d = MediaDims.parse(b)
        if (d.width <= 0 || d.height <= 0) None
        else {
          val (ow, oh) = fitWithin(d.width, d.height, maxW, maxH)
          val thumb =
            try Some(resizer.resize(b, ow, oh))
            catch { case _: IllegalArgumentException => None }
          thumb.map(t => ResizedAsset(
            p.substring(p.lastIndexOf('/') + 1), d.kind,
            d.width, d.height, ow, oh, t))
        }
      })
  }

  /** 9×8 luma grid by AREA-AVERAGE downsample — the dHash raster.
    * Integer BT.601-ish luma per source pixel, integer mean per cell
    * block (floor boundaries), so the grid is bit-identical on any
    * JVM. Area averaging (not nearest-neighbor) is what makes the
    * hash robust to resizing and recompression: every source pixel
    * votes, so small local changes wash out.
    */
  private[graft] def grayGrid(img: java.awt.image.BufferedImage,
                              gw: Int = 9, gh: Int = 8): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w > 0 && h > 0, "empty raster")
    val out = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = math.max(y0 + 1, ((cy + 1).toLong * h / gh).toInt)
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * w / gw).toInt
        val x1 = math.max(x0 + 1, ((cx + 1).toLong * w / gw).toInt)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sum += (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit DIFFERENCE hash of a 9×8 luma grid: bit k (MSB-first,
    * k = row·8 + col) set when cell (row, col) is strictly brighter
    * than its right neighbor — the standard dHash gradient
    * fingerprint. Shared kernel: the REAL pixel path ([[dHash64]])
    * and the q158 fake-decode column formulation both commit to this
    * exact layout, so the banded Hamming index serves either.
    */
  private[graft] def dHash64FromGrid(grid: Array[Long], gw: Int = 9): Long = {
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        hash = (hash << 1) | (if (grid(r * gw + c) > grid(r * gw + c + 1)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Perceptual difference-hash of an encoded image: ImageIO decode →
    * 9×8 area-average luma grid → 64 gradient bits. Resize and
    * recompress variants of one image land within a small Hamming
    * distance (spec-pinned in PHashSpec); distinct images do not.
    * Undecodable bytes throw `IllegalArgumentException` (the
    * [[decodeImage]] per-asset-drop contract).
    */
  def dHash64(bytes: Array[Byte]): Long =
    dHash64FromGrid(grayGrid(decodeImage(bytes)))

  /** Typed per-asset perceptual hash row: the 64-bit dHash split into
    * 32-bit halves (as longs), the fingerprint shape
    * [[graft.queries.NearDupOps.bandedHammingPairs]] indexes.
    */
  final case class ImageHash(file_name: String, hi: Long, lo: Long)

  /** Perceptual-hash a `binaryFile` frame (columns `path`, `content`)
    * partition-parallel — the [[extractFeatures]] iterator shape.
    * Undecodable assets are dropped per-asset (a perceptual hash of
    * undecodable bytes has no meaning — the [[resizeAssets]]
    * stance).
    */
  def imageHashes(files: DataFrame): Dataset[ImageHash] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) =>
        val h =
          try Some(dHash64(b))
          catch { case _: IllegalArgumentException => None }
        h.map(v => ImageHash(p.substring(p.lastIndexOf('/') + 1),
          (v >>> 32) & 0xFFFFFFFFL, v & 0xFFFFFFFFL))
      })
  }

  /** Uniform frame-sample plan: which k of n frames to decode. Pure
    * index math (ceil-spaced across [0, n)), so the expensive decode
    * only ever touches the sampled frames — the video analog of
    * column pruning. Deterministic; first frame always included, k
    * clamped to n.
    */
  def frameSampleIndices(nFrames: Int, k: Int): Seq[Int] = {
    require(nFrames >= 0 && k >= 0, s"negative args: n=$nFrames k=$k")
    if (nFrames == 0 || k == 0) Seq.empty
    else if (k >= nFrames) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt)
  }
}

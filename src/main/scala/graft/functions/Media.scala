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
  * byte arithmetic — no codec dependency. What remains a SEAM is the
  * pixel/feature model: this container ships no image/audio codecs or
  * embedding models, so [[Media.headerDecode]] pairs the real header
  * geometry with a deterministic pseudo-feature vector derived from
  * the raw bytes. A real deployment swaps the feature function for a
  * codec+model-backed `Decoder` (javax.imageio, ffmpeg bindings, an
  * ONNX encoder, …) without touching the Spark plumbing — the schema,
  * the partition-parallel batch shape, and the typed seam stay as
  * tested here. Resize / frame-sample follow the same seam:
  * bytes→bytes decoders composed before feature extraction.
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

  /** Pluggable resize seam (bytes + target geometry → bytes). The
    * container ships no codecs, so [[stubResizer]] is the default;
    * a real deployment swaps in an imageio/libvips-backed
    * implementation without touching the plumbing.
    */
  trait Resizer extends Serializable {
    def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte]
  }

  /** STUB pixel path: emits a deterministic pseudo-thumbnail (magic +
    * geometry + FNV digest of the source bytes — content-addressed,
    * so identical inputs produce identical outputs under any
    * partitioning) instead of decoded pixels. The SEAM is the point:
    * schema, batch shape, and geometry math around it are real.
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
    * headers) are dropped — a resize of an un-decodable asset has no
    * meaning, and at 100 TB silently passing them through would
    * double-store the corpus.
    */
  def resizeAssets(files: DataFrame, maxW: Int, maxH: Int,
                   resizer: Resizer = stubResizer): Dataset[ResizedAsset] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) =>
        val d = MediaDims.parse(b)
        if (d.width <= 0 || d.height <= 0) None
        else {
          val (ow, oh) = fitWithin(d.width, d.height, maxW, maxH)
          Some(ResizedAsset(
            p.substring(p.lastIndexOf('/') + 1), d.kind,
            d.width, d.height, ow, oh, resizer.resize(b, ow, oh)))
        }
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

package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (binary-column) handling — SURVEY §2.9. Media assets
  * are opaque `binary` columns with typed metadata alongside; decode
  * and feature extraction run partition-parallel over the bytes with
  * an iterator-to-iterator transform (bounded memory per task, no
  * driver materialization), which is the Scala analog of a
  * `mapInPandas` batch UDF.
  *
  * The DECODE step is a STUB: this container ships no image/audio
  * codecs, so [[Media.decodeStub]] derives deterministic
  * pseudo-metadata and a pseudo-feature vector from the raw bytes. A
  * real deployment swaps in a codec-backed `Decoder` (javax.imageio,
  * ffmpeg bindings, …) without touching the Spark plumbing — the
  * schema, the partition-parallel batch shape, and the typed seam are
  * the real, tested parts. Resize / frame-sample follow the same
  * seam: bytes→bytes decoders composed before feature extraction.
  */
object Media {

  /** Typed decode output: media kind sniffed from magic bytes, pseudo
    * dimensions, and a fixed-width feature vector (FeatureDim).
    */
  final case class MediaMeta(
      file_name: String,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  val FeatureDim = 8

  /** Pluggable decoder seam (bytes → typed metadata + features). */
  trait Decoder extends Serializable {
    def decode(path: String, bytes: Array[Byte]): MediaMeta
  }

  /** STUB decoder — deterministic pseudo-decode (NOT a real codec):
    * kind from magic bytes, dimensions/frames/features from a rolling
    * FNV-1a over the content. Deterministic across runs and
    * partitionings so the pipeline around it is testable.
    */
  object decodeStub extends Decoder {
    private def fnv(bytes: Array[Byte], seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      h
    }
    override def decode(path: String, bytes: Array[Byte]): MediaMeta = {
      val kind =
        if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'A' &&
          bytes(2) == 'R' && bytes(3) == '1') "parquet"
        else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8) "jpeg"
        else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P') "png"
        else "unknown"
      val h = fnv(bytes, 0L)
      val meta = MediaMeta(
        file_name = path.substring(path.lastIndexOf('/') + 1),
        kind = kind,
        width = (math.floorMod(h, 1920L) + 1L).toInt,
        height = (math.floorMod(h >>> 16, 1080L) + 1L).toInt,
        n_frames = (math.floorMod(h >>> 32, 240L) + 1L).toInt,
        feature = Array.tabulate(FeatureDim) { i =>
          val f = fnv(bytes, i + 1L)
          (math.floorMod(f, 2000L) - 1000L).toFloat / 1000.0f
        })
      meta
    }
  }

  /** Decode + feature-extract a `binaryFile` frame (columns `path`,
    * `content`) partition-parallel. Iterator-to-iterator: one asset's
    * bytes in flight per task at a time; partitioning (and therefore
    * cluster parallelism) is preserved.
    */
  def extractFeatures(files: DataFrame, decoder: Decoder = decodeStub): Dataset[MediaMeta] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, b) => decoder.decode(p, b) })
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

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real (pure-JVM, codec-free) media header decode over a `binary`
  * column: container sniffing from magic bytes plus pixel dimensions
  * and frame count parsed directly from the format headers —
  * PNG (IHDR), JPEG (SOFn marker walk), GIF (logical screen
  * descriptor + image-descriptor block walk for frame count),
  * BMP (BITMAPINFOHEADER / BITMAPCOREHEADER), WebP (VP8 frame tag /
  * VP8L stream header), WAV (RIFF/WAVE), and Parquet (PAR1).
  *
  * Output is `struct<kind:string, width:int, height:int,
  * n_frames:int>`; `kind` is never null ("unknown" for unrecognized
  * bytes), the numeric fields are null when the format has no pixel
  * dimensions (parquet, wav, unknown) or the header is truncated.
  *
  * This replaces the stub pseudo-dimensions the multimodal seam
  * (reference: etl_supabase.py:88-108 treats files as opaque payloads)
  * shipped in earlier rounds: header geometry needs no codec
  * dependency, only byte arithmetic, so it belongs in the engine.
  * Pixel decode / resize / feature models remain the documented seam.
  *
  * Posture: a native `Expression` with `doGenCode` (static-kernel
  * call, same pattern as [[SimHash64]]) so the decode participates in
  * whole-stage codegen over `binaryFile` scans — no UDF, no
  * per-row boxing beyond the unavoidable byte-array handoff.
  */
case class MediaDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_dims requires binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  override def prettyName: String = "media_dims"

  override def nullSafeEval(input: Any): Any =
    MediaDims.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MediaDims.parseRow($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaDims =
    copy(child = newChild)
}

object MediaDims {

  /** Parsed header geometry; -1 marks "not applicable / not parseable"
    * for the numeric fields (adapters turn it into SQL null).
    */
  final case class Parsed(kind: String, width: Int, height: Int, nFrames: Int)

  private val None3 = -1

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  /** PNG: 8-byte signature, IHDR chunk mandatory-first at offset 8
    * (length 13, type "IHDR"), width/height big-endian u32 at 16/20.
    * Frame count 1, unless an acTL chunk (APNG animation control)
    * appears before IDAT, whose num_frames we report.
    */
  private def png(b: Array[Byte]): Parsed = {
    if (b.length < 24 || !ascii(b, 12, "IHDR"))
      return Parsed("png", None3, None3, None3)
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return Parsed("png", None3, None3, None3)
    // chunk walk for acTL: offset 8 + per chunk (4 len + 4 type + data + 4 crc)
    var p = 8
    var frames = 1
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || len > b.length - p) done = true // malformed/truncated
      else if (ascii(b, p + 4, "acTL") && p + 12 <= b.length) {
        val n = be32(b, p + 8)
        if (n > 0) frames = n
        done = true
      } else if (ascii(b, p + 4, "IDAT") || ascii(b, p + 4, "IEND")) done = true
      else p += 12 + len // 4 len + 4 type + data + 4 crc
    }
    Parsed("png", w, h, frames)
  }

  /** JPEG: marker walk from offset 2 to the first SOFn
    * (0xC0–0xCF except C4/C8/CC — DHT/JPG/DAC carry no geometry);
    * height big-endian u16 at +5, width at +7 inside the segment.
    */
  private def jpeg(b: Array[Byte]): Parsed = {
    val n = b.length
    var i = 2
    while (i + 3 < n) {
      if ((b(i) & 0xff) != 0xff) return Parsed("jpeg", None3, None3, None3)
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < n) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone markers
      else if (m == 0xd9 || m == 0xda) return Parsed("jpeg", None3, None3, None3)
      else {
        val len = be16(b, i + 2)
        if (len < 2) return Parsed("jpeg", None3, None3, None3)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 < n) {
            val h = be16(b, i + 5)
            val w = be16(b, i + 7)
            if (w > 0 && h > 0) return Parsed("jpeg", w, h, 1)
          }
          return Parsed("jpeg", None3, None3, None3)
        }
        i += 2 + len
      }
    }
    Parsed("jpeg", None3, None3, None3)
  }

  /** GIF: logical screen descriptor (width/height little-endian u16 at
    * 6/8), then a block walk counting image descriptors (0x2C) for the
    * frame count — skipping the global/local color tables and the
    * length-prefixed data sub-blocks. A truncated stream yields the
    * frames seen so far (min 1 so a bare header still reads as one).
    */
  private def gif(b: Array[Byte]): Parsed = {
    val n = b.length
    if (n < 13) return Parsed("gif", None3, None3, None3)
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return Parsed("gif", None3, None3, None3)
    var p = 13
    val flags = b(10) & 0xff
    if ((flags & 0x80) != 0) p += 3 * (1 << ((flags & 7) + 1))

    def skipSubBlocks(start: Int): Int = { // returns next pos, or -1 on truncation
      var q = start
      while (q < n) {
        val len = b(q) & 0xff
        if (len == 0) return q + 1
        q += 1 + len
      }
      -1
    }

    var frames = 0
    var done = false
    while (!done && p < n && p >= 0) {
      (b(p) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: introducer + label + sub-blocks
          p = if (p + 2 < n) skipSubBlocks(p + 2) else -1
          if (p < 0) done = true
        case 0x2c => // image descriptor: 10 bytes + local table + LZW
          frames += 1
          if (p + 10 < n) {
            val lf = b(p + 9) & 0xff
            p += 10
            if ((lf & 0x80) != 0) p += 3 * (1 << ((lf & 7) + 1))
            p += 1 // LZW minimum code size
            p = if (p <= n) skipSubBlocks(p) else -1
            if (p < 0) done = true
          } else done = true
        case _ => done = true // malformed
      }
    }
    Parsed("gif", w, h, math.max(frames, 1))
  }

  /** BMP: "BM" + DIB header; BITMAPINFOHEADER (size >= 40) carries
    * signed little-endian dims at 18/22 (negative height = top-down
    * rows — geometry is the absolute value); the ancient
    * BITMAPCOREHEADER (size 12) uses u16.
    */
  private def bmp(b: Array[Byte]): Parsed = {
    if (b.length < 26) return Parsed("bmp", None3, None3, None3)
    val hdr = le32(b, 14)
    if (hdr >= 40 && b.length >= 26) {
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22))
      if (w > 0 && h > 0) Parsed("bmp", w, h, 1)
      else Parsed("bmp", None3, None3, None3)
    } else if (hdr == 12 && b.length >= 22) {
      val w = le16(b, 18)
      val h = le16(b, 20)
      if (w > 0 && h > 0) Parsed("bmp", w, h, 1)
      else Parsed("bmp", None3, None3, None3)
    } else Parsed("bmp", None3, None3, None3)
  }

  /** RIFF containers: WebP (VP8 lossy frame tag / VP8L stream header)
    * and WAV (audio — no pixel geometry).
    */
  private def riff(b: Array[Byte]): Parsed = {
    if (ascii(b, 8, "WAVE")) return wav(b)
    if (!ascii(b, 8, "WEBP")) return Parsed("unknown", None3, None3, None3)
    if (ascii(b, 12, "VP8 ") && b.length >= 30 &&
      (b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a) {
      val w = le16(b, 26) & 0x3fff
      val h = le16(b, 28) & 0x3fff
      if (w > 0 && h > 0) return Parsed("webp", w, h, 1)
    } else if (ascii(b, 12, "VP8L") && b.length >= 25 && (b(20) & 0xff) == 0x2f) {
      val bits = (b(21) & 0xff) | ((b(22) & 0xff) << 8) |
        ((b(23) & 0xff) << 16) | ((b(24) & 0xff) << 24)
      val w = (bits & 0x3fff) + 1
      val h = ((bits >>> 14) & 0x3fff) + 1
      return Parsed("webp", w, h, 1)
    }
    Parsed("webp", None3, None3, None3)
  }

  /** WAV sample-FRAME count (round 9): RIFF chunk walk to `fmt `
    * (block align = bytes per sample frame, little-endian at chunk
    * byte 12) and `data` (payload size); n_frames = dataSize /
    * blockAlign. The audio analog of the MP4 sample table — the n
    * that a k-of-n audio frame-sampling plan needs, from header
    * arithmetic alone. Width/height stay null (audio has none);
    * missing/truncated chunks degrade to null.
    */
  private def wav(b: Array[Byte]): Parsed = {
    val n = b.length
    var p = 12
    var blockAlign = -1
    var dataSize = -1L
    while (p + 8 <= n && (blockAlign < 0 || dataSize < 0)) {
      val sz = le32(b, p + 4) & 0xffffffffL
      if (ascii(b, p, "fmt ") && sz >= 16 && p + 8 + 14 <= n)
        blockAlign = le16(b, p + 8 + 12)
      else if (ascii(b, p, "data")) {
        // the binary cell holds the whole file, so the data payload
        // must fit in the remaining buffer: a streaming-placeholder
        // size (0xFFFFFFFF) or any lying header that claims more
        // bytes than exist degrades to null instead of feeding a
        // bogus n into a k-of-n frame-sampling plan
        if (sz > (n - (p + 8)).toLong) return Parsed("wav", None3, None3, None3)
        dataSize = sz
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      val np = p.toLong + 8 + sz + (sz & 1)
      if (np <= p || np > Int.MaxValue) return Parsed("wav", None3, None3, None3)
      p = np.toInt
    }
    if (blockAlign > 0 && dataSize >= 0 && dataSize / blockAlign <= Int.MaxValue)
      Parsed("wav", None3, None3, (dataSize / blockAlign).toInt)
    else Parsed("wav", None3, None3, None3)
  }

  /** MP4 / ISO-BMFF: box walk moov → trak → tkhd. Width/height are
    * 16.16 fixed-point at byte 84 (tkhd v0) / 96 (v1) from the box
    * start; the first trak with nonzero dims wins (audio traks carry
    * 0×0). Boxes with size < 8 (0 = to-end, 1 = 64-bit largesize)
    * stop the walk — headers that large are beyond a sniff. Frame
    * count (round 9): the winning video trak's sample COUNT read
    * from its stbl — `stsz`/`stz2` carry it directly at byte 16
    * (after version/flags + sample_size), falling back to summing
    * `stts` run lengths — walked trak → mdia → minf → stbl, every
    * step bounds-checked; absent/truncated tables degrade to null.
    * This is what makes [[graft.functions.Media.frameSampleIndices]]
    * REAL for video: the k-of-n sampling plan needs n, and n comes
    * from container metadata — no codec, no frame decode.
    */
  private def mp4(b: Array[Byte]): Parsed = {
    val n = b.length
    def next(p: Int, end: Int): Int = {
      val sz = be32(b, p)
      if (sz < 8) return -1
      val np = p.toLong + sz
      if (np <= p || np > end) -1 else np.toInt
    }
    def findBox(name: String, from: Int, end: Int): Int = {
      var p = from
      while (p >= 0 && p + 8 <= end) {
        if (ascii(b, p + 4, name)) return p
        p = next(p, end)
      }
      -1
    }
    val moov = findBox("moov", 0, n)
    if (moov < 0) return Parsed("mp4", None3, None3, None3)
    val mEnd = math.min(n.toLong,
      moov.toLong + math.max(8, be32(b, moov))).toInt
    var p = moov + 8
    while (p >= 0 && p + 8 <= mEnd) {
      if (ascii(b, p + 4, "trak")) {
        val tEnd = math.min(mEnd.toLong,
          p.toLong + math.max(8, be32(b, p))).toInt
        val tk = findBox("tkhd", p + 8, tEnd)
        if (tk >= 0 && tk + 9 <= n) {
          val off = if ((b(tk + 8) & 0xff) == 1) tk + 96 else tk + 84
          if (off + 8 <= tEnd) {
            val w = be32(b, off) >>> 16
            val h = be32(b, off + 4) >>> 16
            if (w > 0 && h > 0)
              return Parsed("mp4", w, h, trakSampleCount(b, p, tEnd))
          }
        }
      }
      p = next(p, mEnd)
    }
    Parsed("mp4", None3, None3, None3)
  }

  /** Sample count of one trak: trak → mdia → minf → stbl, then
    * stsz/stz2's sample_count field (bytes 16..19 of the box), else
    * the sum of stts run lengths. Returns null-marker when the walk
    * or the bounds fail anywhere.
    */
  private def trakSampleCount(b: Array[Byte], trak: Int, tEnd: Int): Int = {
    def sub(name: String, from: Int, end: Int): (Int, Int) = {
      var p = from
      while (p >= 0 && p + 8 <= end) {
        if (ascii(b, p + 4, name))
          return (p, math.min(end.toLong,
            p.toLong + math.max(8, be32(b, p))).toInt)
        val sz = be32(b, p)
        if (sz < 8) return (-1, -1)
        val np = p.toLong + sz
        if (np <= p || np > end) return (-1, -1) else p = np.toInt
      }
      (-1, -1)
    }
    val (md, mdEnd) = sub("mdia", trak + 8, tEnd)
    if (md < 0) return None3
    val (mi, miEnd) = sub("minf", md + 8, mdEnd)
    if (mi < 0) return None3
    val (st, stEnd) = sub("stbl", mi + 8, miEnd)
    if (st < 0) return None3
    val (sz, szEnd) = {
      val a = sub("stsz", st + 8, stEnd)
      if (a._1 >= 0) a else sub("stz2", st + 8, stEnd)
    }
    if (sz >= 0 && sz + 20 <= szEnd) {
      val count = be32(b, sz + 16)
      if (count >= 0) return count
    }
    val (tt, ttEnd) = sub("stts", st + 8, stEnd)
    if (tt >= 0 && tt + 16 <= ttEnd) {
      val entries = be32(b, tt + 12)
      var total = 0L; var i = 0; var p = tt + 16
      while (i < entries && p + 8 <= ttEnd) {
        total += (be32(b, p) & 0xffffffffL); i += 1; p += 8
      }
      if (i == entries && total <= Int.MaxValue) return total.toInt
    }
    None3
  }

  /** Sniff + parse. Never throws on arbitrary bytes: every branch is
    * bounds-checked and malformed headers degrade to null dims.
    */
  def parse(b: Array[Byte]): Parsed = {
    val n = b.length
    if (n >= 8 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) png(b)
    else if (n >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) jpeg(b)
    else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) gif(b)
    else if (n >= 12 && ascii(b, 0, "RIFF")) riff(b)
    else if (n >= 12 && ascii(b, 4, "ftyp")) mp4(b)
    else if (ascii(b, 0, "BM") && n >= 26) bmp(b)
    else if (ascii(b, 0, "PAR1")) Parsed("parquet", None3, None3, None3)
    else Parsed("unknown", None3, None3, None3)
  }

  /** Codegen/eval kernel: parse into the output struct's InternalRow. */
  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.kind),
      if (p.width < 0) null else p.width,
      if (p.height < 0) null else p.height,
      if (p.nFrames < 0) null else p.nFrames))
  }
}

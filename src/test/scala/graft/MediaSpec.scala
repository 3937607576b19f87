package graft

import org.apache.spark.sql.functions._

import graft.functions.Media
import graft.queries.Registry

/** Pins the multimodal pipeline around the stub decoder: schema,
  * determinism, partition-parallel shape, and magic-byte sniffing.
  * The stub is the decode seam — these tests are what stays true when
  * a real codec is plugged in.
  */
class MediaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def files = spark.read.format("binaryFile")
    .option("pathGlobFilter", "*.parquet").load(dir)

  test("extractFeatures: one typed row per file, fixed feature width") {
    val ds = Media.extractFeatures(files)
    val rows = ds.collect()
    assert(rows.length.toLong === files.count())
    rows.foreach { m =>
      assert(m.feature.length === Media.FeatureDim)
      assert(m.kind === "parquet") // fixture files all carry the PAR1 magic
      assert(m.width >= 1 && m.height >= 1 && m.n_frames >= 1)
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
      ("a.bin", Array[Byte]('P', 'A', 'R', '1', 9)),
      ("b.parquet", Array[Byte](0xff.toByte, 0xd8.toByte, 0x00)),
      ("c.x", Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0)),
      ("d.x", Array[Byte](1, 2, 3))).toDF("path", "content")
    val kinds = Media.extractFeatures(fake).collect()
      .map(m => m.file_name -> m.kind).toMap
    assert(kinds === Map("a.bin" -> "parquet", "b.parquet" -> "jpeg",
      "c.x" -> "png", "d.x" -> "unknown"))
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
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Multimodal/binary-column operators (SURVEY §2.9): files as opaque
  * binary columns with typed metadata. q70 is byte-level metadata
  * over the scale-factor directory's own parquet files (verifiable
  * against DuckDB's read_blob on the same files); q71 is the
  * decode→feature pipeline with the stub decoder (rows-only oracle;
  * behavior pinned in MediaSpec).
  *
  * Scale posture: `binaryFile` is a DataSource V2 file source — one
  * file per task row, distributed listing, and a 2 GiB per-file guard;
  * nothing is collected to the driver. The oracle path is fixed at
  * sf0.01 because the driver's DuckDB compare runs there; the Spark
  * side uses the provided directory.
  */
object MultimodalOps {

  lazy val queries: Seq[Q] = Seq(

    // -- binary file read as a table: name, size, content hash. The
    //    `path` column is normalized to the bare file name so both
    //    engines agree (Spark reports a file: URI, DuckDB a raw path).
    Q("q70_binary_meta",
      (s, d) => s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(d)
        .select(
          regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
          col("length"),
          // hash the (uppercase, engine-identical) hex encoding — the
          // oracle's sha256 only accepts VARCHAR, not BLOB
          sha2(hex(col("content")), 256).as("content_sha"))
        .orderBy(col("file_name")),
      Some("""SELECT regexp_extract(filename, '[^/]+$', 0) AS file_name,
          size AS length, sha256(hex(content)) AS content_sha
        FROM read_blob('/root/testdata/sf0.01/*.parquet')
        ORDER BY file_name"""),
      "files as binary columns: name/size/sha256 vs read_blob"),

    // -- REAL header decode via the native media_dims expression
    //    (graft.expressions.MediaDims: PNG IHDR / JPEG SOFn / GIF LSD
    //    / BMP DIB / WebP VP8(L) parsed with pure byte arithmetic,
    //    inside whole-stage codegen). On the sf directory the assets
    //    are parquet files — kind sniffs as 'parquet', geometry null —
    //    which DuckDB can verify from the same bytes; image-format
    //    geometry is pinned bit-exactly in MediaSpec on crafted
    //    headers, and the feature-vector seam stays covered by
    //    Media.extractFeatures (also MediaSpec).
    Q("q71_media_features",
      (s, d) => s.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(d)
        .select(
          regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
          ColumnBridge.column(graft.expressions.MediaDims(
            ColumnBridge.expression(col("content")))).as("m"))
        .select(col("file_name"), col("m.kind").as("kind"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.n_frames").as("n_frames"))
        .orderBy(col("file_name")),
      Some("""SELECT regexp_extract(filename, '[^/]+$', 0) AS file_name,
          CASE WHEN hex(content)[1:8] = '50415231' THEN 'parquet'
               ELSE 'unknown' END AS kind,
          CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
          CAST(NULL AS INT) AS n_frames
        FROM read_blob('/root/testdata/sf0.01/*.parquet')
        ORDER BY file_name"""),
      "real header decode (media_dims native expression) vs read_blob")
  )
}

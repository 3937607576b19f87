package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Media

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

  val queries: Seq[Q] = Seq(

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

    // -- decode + feature extraction through the typed partition-
    //    parallel seam (stub decoder — see graft.functions.Media):
    //    kind sniffing from magic bytes, pseudo dimensions, and an
    //    8-float feature vector; surfaced with the feature norm so
    //    the vector path is exercised end-to-end.
    Q("q71_media_features",
      (s, d) => {
        val files = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.parquet")
          .load(d)
        Media.extractFeatures(files).toDF()
          .select(col("file_name"), col("kind"), col("width"),
            col("height"), col("n_frames"),
            aggregate(transform(col("feature"), _.cast("double")),
              lit(0.0), (a, x) => a + x * x).as("feature_sq_norm"))
          .orderBy(col("file_name"))
      },
      None,
      "stub decode -> typed metadata + feature vector (rows-only oracle)")
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines (north-star extension, BASELINE.json): media travels as an
  * opaque `binary` column plus typed metadata, exactly like a lakehouse
  * corpus table. The Spark-side plumbing — schemas, binary expressions,
  * partition-friendly shapes — is real and tested; the pixel/sample
  * DECODING is a clearly-marked deterministic stub, because no
  * image/audio codec libraries exist in this environment. A production
  * build would swap [[fakeEmbedding]]'s hash kernel for a vectorized
  * decode (Arrow-batched UDF or a native Expression over the codec),
  * keeping every signature and plan shape here unchanged.
  */
object MultiModal {

  /** The canonical media column type: payload + source metadata. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("source_uri", StringType)))

  /** Magic-byte container sniffing over the first bytes of the payload —
    * metadata extraction that needs no codec. Hex-prefix comparisons are
    * all codegen'd string/binary built-ins. */
  def sniffFormat(bytes: Column): Column = {
    def prefix(n: Int): Column = upper(hex(substring(bytes, 1, n)))
    when(bytes.isNull, lit(null))
      .when(prefix(3) === "FFD8FF", "jpeg")
      .when(prefix(4) === "89504E47", "png")
      .when(prefix(3) === "474946", "gif")
      // RIFF containers: WAVE/AVI discriminated by bytes 9-12
      .when(prefix(4) === "52494646" && upper(hex(substring(bytes, 9, 4))) === "57415645", "wav")
      .when(prefix(4) === "52494646" && upper(hex(substring(bytes, 9, 4))) === "41564920", "avi")
      // ISO-BMFF (mp4 family): "ftyp" at offset 5
      .when(upper(hex(substring(bytes, 5, 4))) === "66747970", "mp4")
      .when(prefix(4) === "25504446", "pdf")
      .otherwise("unknown")
  }

  /** Per-row media metadata: size, container, content digest. */
  def mediaMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)))
      .withColumn("format", sniffFormat(col(bytesCol)))
      .withColumn("content_sha", sha2(col(bytesCol), 256))

  /** REAL (not stubbed) pixel dimensions from container headers — PNG/
    * GIF/BMP fixed offsets, JPEG SOF marker walk, via the codegen'd
    * `media_dims` kernel; no codec involved, so this runs in the same
    * zero-shuffle projection as the rest of the metadata. NULL columns
    * for unrecognized/truncated payloads (corrupt media is data). */
  def withDimensions(df: DataFrame, bytesCol: String): DataFrame = {
    val dims = graft.functions.native.mediaDims(col(bytesCol))
    df.withColumn("width", element_at(dims, 1))
      .withColumn("height", element_at(dims, 2))
  }

  /** STUB feature extractor: a deterministic pseudo-embedding derived by
    * hashing (payload, dimension-index) — stands in for "decode media,
    * run the encoder". Real per-dim values in [-1, 1], fixed `dim`,
    * deterministic across runs/partitions; shape-compatible with the
    * Similarity/NearDup embedding operators so the full downstream
    * pipeline is exercised. */
  def fakeEmbedding(bytes: Column, dim: Int): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i =>
        ((pmod(xxhash64(i, bytes), lit(2000001L)).cast("double") / 1000000.0) - 1.0)
          .cast("float"))

  /** STUB frame sampler: `n` evenly-spaced byte slices standing in for
    * decoded video frames (a real impl would emit one decoded image per
    * sampled timestamp; the array-of-binary column shape, the explode
    * pattern and the per-frame downstream ops are what matters here). */
  def frameSample(bytes: Column, n: Int, frameBytes: Int = 1024): Column = {
    val len = octet_length(bytes)
    transform(
      sequence(lit(0), lit(n - 1)),
      i => substring(bytes, (i * greatest(len - frameBytes, lit(1)) / n + 1).cast("int"), lit(frameBytes)))
  }

  /** documents.text re-encoded as a binary payload — the fixture stand-in
    * for a media corpus (no binary fixture table exists; UTF-8 bytes are
    * the honest opaque payload available). */
  def docBlobs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("lang"))
}

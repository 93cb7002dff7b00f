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
      .when(prefix(2) === "424D", "bmp")
      // RIFF containers: WEBP/WAVE/AVI discriminated by bytes 9-12
      .when(prefix(4) === "52494646" && upper(hex(substring(bytes, 9, 4))) === "57454250", "webp")
      .when(prefix(4) === "52494646" && upper(hex(substring(bytes, 9, 4))) === "57415645", "wav")
      .when(prefix(4) === "52494646" && upper(hex(substring(bytes, 9, 4))) === "41564920", "avi")
      // TIFF: endian marker + magic 42
      .when(prefix(4) === "49492A00" || prefix(4) === "4D4D002A", "tiff")
      .when(prefix(4) === "664C6143", "flac") // "fLaC"
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
    * GIF/BMP fixed offsets, JPEG SOF marker walk, WEBP bitstream
    * headers (VP8/VP8L/VP8X), TIFF first-IFD walk in either byte
    * order — via the codegen'd `media_dims` kernel; no codec involved,
    * so this runs in the same zero-shuffle projection as the rest of
    * the metadata. NULL columns for unrecognized/truncated payloads
    * (corrupt media is data). */
  def withDimensions(df: DataFrame, bytesCol: String): DataFrame = {
    // parse ONCE into a named column, then project the fields out of the
    // attribute: CollapseProject refuses to inline a non-cheap expression
    // referenced twice, so the header walk runs once per row even when
    // whole-stage codegen (and its subexpression elimination) is off
    require(!df.columns.contains("_graft_dims"),
      "input already carries the staging column name '_graft_dims'")
    val dims = graft.functions.native.mediaDims(col(bytesCol))
    df.withColumn("_graft_dims", dims)
      .withColumn("width", element_at(col("_graft_dims"), 1))
      .withColumn("height", element_at(col("_graft_dims"), 2))
      .drop("_graft_dims")
  }

  /** REAL (not stubbed) audio/video CONTAINER metadata — duration,
    * sample rate, channels, bit depth, and video dimensions parsed from
    * WAV RIFF chunks, FLAC STREAMINFO (the spec-mandated first metadata
    * block), and MP4 ISO-BMFF boxes (both `mvhd`/`tkhd`
    * versions) via the codegen'd `av_meta` kernel; the same codec-free,
    * zero-shuffle projection posture as [[withDimensions]]. Fields the
    * container does not carry are NULL (WAV has no dims; MP4 sample
    * rates live in codec-specific `stsd` entries — the decode boundary);
    * non-AV or corrupt payloads yield a NULL struct, so `container` also
    * serves as the "is this parseable AV media" gate. */
  def withAvMeta(df: DataFrame, bytesCol: String): DataFrame = {
    // one parse per row, seven cheap field reads — same single-eval
    // projection shape as [[withDimensions]], and it matters 7× more here
    require(!df.columns.contains("_graft_av"),
      "input already carries the staging column name '_graft_av'")
    val av = graft.functions.native.avMeta(col(bytesCol))
    df.withColumn("_graft_av", av)
      .withColumn("av_container", col("_graft_av.container"))
      .withColumn("duration_ms", col("_graft_av.duration_ms"))
      .withColumn("sample_rate", col("_graft_av.sample_rate"))
      .withColumn("channels", col("_graft_av.channels"))
      .withColumn("bit_depth", col("_graft_av.bit_depth"))
      .withColumn("video_width", col("_graft_av.width"))
      .withColumn("video_height", col("_graft_av.height"))
      .drop("_graft_av")
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

  /** STUB resize: stands in for decode → scale to `w`×`h` → re-encode.
    * The deterministic fake keeps the binary→binary per-row projection
    * shape (and NULL-for-NULL corrupt-media contract) a real resampler
    * would have; a production build swaps the body for the codec call,
    * signatures unchanged. */
  def resizeStub(bytes: Column, w: Int, h: Int): Column = {
    require(w >= 1 && h >= 1, s"target dims must be positive: ${w}x$h")
    when(bytes.isNotNull, substring(bytes, 1, w * h))
  }

  /** STUB batch encoder body — deterministic pseudo-embeddings from
    * md5(payload ‖ dim-index), mapped into [-1, 1]. Replace with the
    * real decode+model call (ONNX/JNI/external service); everything
    * around it — the batch shape, schema, partitioning — stays. */
  private[ops] def encodeBatchStub(
      payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    payloads.map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i =>
        md.reset()
        md.update(p)
        md.update(Array[Byte](
          (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte))
        val d = md.digest()
        // first 4 digest bytes → u32 → [-1, 1]; deterministic across
        // runs, partitions, and JVMs
        val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        ((u.toDouble / 0xffffffffL.toDouble) * 2.0 - 1.0).toFloat
      }
    }

  /** Batched media encoding — the Scala analog of the `mapInPandas`
    * pattern the reference brief names for multimodal columns: payloads
    * are handed to the encoder `batchSize` AT A TIME in ONE call per
    * batch (a GPU/ONNX encoder amortizes model dispatch per batch, not
    * per row — per-row calls are the classic 100× trap), via
    * `mapPartitions` so no shuffle is introduced and each task batches
    * its own partition. The encoder body is the clearly-marked
    * [[encodeBatchStub]] (no codec libraries in this environment); the
    * REAL parts — the batch grouping, the output schema
    * (id, embedding, batch_ix, batch_n), partition-local batching, and
    * determinism under any partitioning — are spec-tested
    * (MultiModalSpec), and the output embeds straight into the
    * Similarity/NearDup operators. NULL payloads are dropped (corrupt
    * media is filtered, not crashed on). */
  def batchedEncode(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      dim: Int,
      batchSize: Int = 64): DataFrame = {
    require(dim >= 1 && batchSize >= 1, s"dim=$dim batchSize=$batchSize must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .filter(col(bytesCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bix) =>
          val embs = encodeBatchStub(batch.map(_._2), dim)
          batch.lazyZip(embs).map { case ((id, _), e) =>
            (id, e.toSeq, bix, batch.size)
          }
        }
      }
      .toDF(idCol, "embedding", "batch_ix", "batch_n")
  }
}

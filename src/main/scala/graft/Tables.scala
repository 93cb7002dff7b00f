package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every loader goes through `spark.read.parquet` so Catalyst gets a
  * relation it can push filters / prune columns into — callers should
  * select/filter on the returned DataFrame and let pushdown do its job,
  * never pre-materialize.
  */
object Tables {

  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** The CDC-changelog stand-in, normalized so `ts` is ALWAYS exposed as
    * the epoch-nanos Long `ts_ns` — lossless, totally ordered, and
    * identical in Spark and the DuckDB oracle (`epoch_ns(ts)`), whatever
    * the on-disk layout:
    *  - parquet TIMESTAMP(NANOS) arrives as LongType via the
    *    `nanosAsLong` legacy read (the original driver layout), and the
    *    ScaleProbe tiles round-trip that Long directly — rename;
    *  - parquet TIMESTAMP(MICROS) (the current driver layout) arrives as
    *    TIMESTAMP/TIMESTAMP_NTZ — widen `unix_micros`×1000 to the same
    *    nanos Long (exact: micros-precision input, ×1000 is lossless and
    *    far from Long range). The NTZ→timestamp cast reads wall-clock in
    *    the session zone, which [[GraftSession.configure]] pins to UTC —
    *    the zone the data was generated in.
    * Column position is preserved (select-in-place, not append+drop) so
    * positional consumers and specs see one stable shape. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
      case _ =>
        df.select(df.columns.toSeq.map {
          case "ts" =>
            (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts_ns")
          case c => col(c)
        }: _*)
    }
  }

  /** Epoch-micros view of `ts_ns` for engine-portable output (DuckDB
    * truncates parquet TIMESTAMP_NANOS to micros on read, so micros is the
    * finest precision every engine agrees on; ordering still uses the
    * full-precision `ts_ns`/`event_id`). */
  def withTsMicros(df: DataFrame): DataFrame =
    df.withColumn("ts_us", graft.ops.Windowing.floorDiv(col("ts_ns"), 1000L))

  /** Deterministic binary-media fixture: hand-crafted container headers
    * (the minimal real bytes each parser reads) with their EXPECTED
    * dimensions stored alongside, so the media_dims kernel is checkable
    * by the DuckDB oracle — no binary media table exists in the driver
    * fixture set (TESTDATA.md), so q_media_dims writes this table at
    * query time and both engines read it back. Covers every parser
    * branch: PNG, GIF, JPEG SOF walk, all three BMP header layouts,
    * all three WEBP bitstream flavors (VP8/VP8L/VP8X), TIFF in both
    * byte orders, MP4 ISO-BMFF (video/audio/headless),
    * truncated and non-media payloads (expected NULL dims) — and, for
    * the `av_meta` half of the widened gate, WAV containers (canonical /
    * streamed-prefix / zero-byte-rate / chunk-less shell) with their
    * expected duration/rate/channel/bit-depth figures stored the same
    * way. */
  /** Per-user, per-process fixture path: concurrent driver JVMs must not
    * race on one world-writable directory (an overwrite deletes part
    * files while another process's DuckDB oracle reads the glob), and a
    * directory owned by a different user on a shared host would make
    * the write fail outright. The oracle SQL interpolates this value
    * (built in Scala, dumped per-run by Verify), so writer and reader
    * always agree within a run; the fixture must OUTLIVE this JVM —
    * the driver's DuckDB pass runs after Verify exits — so it is never
    * deleted on exit, just left as a few KB under tmpdir. */
  val mediaFixturePath: String = {
    val user = System.getProperty("user.name", "unknown")
      .replaceAll("[^A-Za-z0-9_-]", "_")
    val pid = ProcessHandle.current().pid()
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    // prune THIS user's fixtures from earlier pids — each run leaves its
    // own directory behind (the DOWNSTREAM ORACLE reads it after this
    // JVM exits), so without pruning they accumulate without bound. A
    // fixture is deleted only when its writer pid is dead AND the
    // directory is over a day old: pid-death alone is not enough — a
    // fixture's oracle read happens minutes-to-hours after its writer
    // exits, so a fresh JVM starting in that window (a bench run between
    // a verify and its compare) must not reap it. A pid recycled onto an
    // unrelated live process just defers cleanup to a later run.
    val mine = raw"graft_media_fixture_${java.util.regex.Pattern.quote(user)}_(\d+)".r
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        // toLongOption + the orElse(false): a malformed sibling name
        // (pid digits overflowing Long) previously threw inside this
        // STATIC initializer and killed every query in the JVM with
        // ExceptionInInitializerError (r20 review finding) — an alien
        // directory is simply not ours to prune
        case mine(p) if p.toLongOption.exists(pl => pl != pid && {
              val h = ProcessHandle.of(pl)
              !(h.isPresent && h.get.isAlive)
            }) && f.lastModified() < cutoff =>
          FsUtil.rmTree(f)
        case _ =>
      }
    }
    new java.io.File(tmp, s"graft_media_fixture_${user}_$pid").getAbsolutePath
  }

  /** The deterministic binary media fixture behind `q_media_dims`:
    * every supported container layout (PNG/GIF/BMP×3/JPEG/WEBP
    * VP8+VP8L+VP8X/TIFF both byte orders/MP4 both tkhd versions/WAV
    * four variants/FLAC two streams — plus truncated/foreign negatives)
    * with its EXPECTED dimensions and av_meta figures STORED NEXT TO
    * the bytes. Engine and oracle read the same fixture: the engine
    * side parses the bytes through the `media_dims`/`av_meta` kernels,
    * the oracle side emits the stored expectations — a kernel
    * mis-parse, or a NULL where figures exist, hash-mismatches in the
    * driver's correctness gate. Written at [[mediaFixturePath]] at
    * Verify time (no binary media table exists in the driver set);
    * byte layouts come from [[MediaBytes]]'s container builders, the
    * public-spec offsets documented at the kernels
    * (graft/functions/native.scala). */
  def mediaFixture(spark: SparkSession): DataFrame = {
    import MediaBytes.{blob, box4, flac, le32, wavFile, wavFmt}
    val png = blob(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      blob(0, 0, 0, 0x0d) ++ "IHDR".getBytes ++
      blob(0, 0, 0x02, 0x80) ++ blob(0, 0, 0x01, 0xe0) // 640 x 480 BE
    val gif = "GIF89a".getBytes ++ blob(0x40, 0x01, 0xf0, 0x00) // 320 x 240 LE
    val bmpInfo = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x28, 0, 0, 0) ++
      blob(0x00, 0x04, 0, 0) ++ blob(0x00, 0x03, 0, 0) // 1024 x 768
    val bmpCore = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x0c, 0, 0, 0) ++
      blob(0x40, 0x01) ++ blob(0xf0, 0x00) ++ new Array[Byte](6) // 320 x 240
    val bmpTopDown = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x28, 0, 0, 0) ++
      blob(0x00, 0x04, 0, 0) ++ blob(0x00, 0xfd, 0xff, 0xff) // 1024 x |-768|
    val jpg = blob(0xff, 0xd8) ++
      blob(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00) ++ // APP0, skipped by length
      blob(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x02, 0x58, 0x03, 0x20, 0x01, 0x11, 0x00) // 800 x 600
    val truncatedPng = blob(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val notMedia = "just some text".getBytes("UTF-8")
    // WEBP, all three bitstream flavors: lossy VP8 (sync 9D 01 2A +
    // 14-bit LE dims), lossless VP8L (0x2F + packed minus-one dims),
    // extended VP8X (24-bit LE minus-one canvas dims)
    val webpLossy = "RIFF".getBytes ++ blob(0x16, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ blob(0x0a, 0, 0, 0) ++
      blob(0, 0, 0) ++ blob(0x9d, 0x01, 0x2a) ++
      blob(0xa0, 0x00) ++ blob(0x78, 0x00) // 160 x 120
    val webpLossless = "RIFF".getBytes ++ blob(0x12, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ blob(0x06, 0, 0, 0) ++
      blob(0x2f, 0x63, 0xc0, 0x13, 0x00, 0x00) // 100 x 80
    val webpExtended = "RIFF".getBytes ++ blob(0x16, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ blob(0x0a, 0, 0, 0) ++ blob(0x02, 0, 0, 0) ++
      blob(0x9f, 0x0f, 0x00) ++ blob(0xb7, 0x0b, 0x00) // 4000 x 3000
    // TIFF, both byte orders: first IFD with SHORT ImageWidth (tag 256)
    // and LONG ImageLength (tag 257)
    val tiffLe = "II".getBytes ++ blob(0x2a, 0x00) ++ blob(0x08, 0, 0, 0) ++
      blob(0x02, 0x00) ++
      blob(0x00, 0x01, 0x03, 0x00, 0x01, 0, 0, 0, 0x80, 0x02, 0, 0) ++ // 256 SHORT 640
      blob(0x01, 0x01, 0x04, 0x00, 0x01, 0, 0, 0, 0xe0, 0x01, 0, 0) ++ // 257 LONG 480
      blob(0, 0, 0, 0)
    val tiffBe = "MM".getBytes ++ blob(0x00, 0x2a) ++ blob(0, 0, 0, 0x08) ++
      blob(0x00, 0x02) ++
      blob(0x01, 0x00, 0x00, 0x03, 0, 0, 0, 0x01, 0x02, 0x80, 0, 0) ++ // 256 SHORT 640
      blob(0x01, 0x01, 0x00, 0x04, 0, 0, 0, 0x01, 0, 0, 0x01, 0xe0) ++ // 257 LONG 480
      blob(0, 0, 0, 0)
    val truncatedWebp = "RIFF".getBytes ++ blob(0x16, 0, 0, 0) ++ "WEBP".getBytes ++
      "VP8 ".getBytes // container intact, bitstream missing
    // ISO-BMFF (mp4): uint32 size + fourcc + payload boxes; dims come
    // from the first VIDEO trak's tkhd (16.16 fixed point) — an
    // audio-only file (0×0 track) has none, and a moov-less file parses
    // to nothing
    val ftyp = box4("ftyp", "isom".getBytes ++ blob(0, 0, 0, 1))
    def tkhdTrak(w: Int, h: Int): Array[Byte] = box4("trak", box4("tkhd",
      blob(0, 0, 0, 7) ++ new Array[Byte](20) ++ new Array[Byte](16) ++
        new Array[Byte](36) ++
        blob((w >>> 8) & 0xff, w & 0xff, 0, 0) ++ blob((h >>> 8) & 0xff, h & 0xff, 0, 0)))
    val mvhd = box4("mvhd", blob(0, 0, 0, 0) ++ new Array[Byte](8) ++
      blob(0, 0, 0x03, 0xe8) ++ blob(0, 0x01, 0x5f, 0x90)) // timescale 1000, 90 000 units
    val mp4Video = ftyp ++ box4("moov", mvhd ++ tkhdTrak(1920, 1080))
    val mp4Audio = ftyp ++ box4("moov", mvhd ++ tkhdTrak(0, 0))
    val mp4NoMoov = ftyp // header only: identified but dimension-less
    // WAV (RIFF/WAVE) for the av_meta half of the gate: rates/channels/
    // bits from `fmt `, duration = data SIZE FIELD over the byte rate
    // (the field is the truth — a streamed prefix holds fewer bytes)
    val wavStereo = wavFile(wavFmt(2, 44100, 176400, 16) ++
      "data".getBytes ++ le32(176400) ++ new Array[Byte](32)) // 1 s declared
    val wavMono = wavFile(wavFmt(1, 16000, 32000, 16) ++
      "data".getBytes ++ le32(64000) ++ new Array[Byte](8)) // 2 s declared
    val wavZeroRate = wavFile(wavFmt(2, 44100, 0, 16) ++
      "data".getBytes ++ le32(1000) ++ blob(0)) // rates known, duration not
    val wavShell = wavFile("junk".getBytes ++ le32(4) ++ blob(0, 0, 0, 0))
    // (media_id, bytes, width, height, container, duration_ms,
    //  sample_rate, channels, bit_depth) — every expectation stored
    // NEXT TO the bytes; both engines read this table back
    val N = Option.empty[Int]
    val rows: Seq[(Long, Array[Byte], Option[Int], Option[Int], Option[String],
        Option[Long], Option[Int], Option[Int], Option[Int])] = Seq(
      (1L, png, Some(640), Some(480), None, None, N, N, N),
      (2L, gif, Some(320), Some(240), None, None, N, N, N),
      (3L, bmpInfo, Some(1024), Some(768), None, None, N, N, N),
      (4L, bmpCore, Some(320), Some(240), None, None, N, N, N),
      (5L, bmpTopDown, Some(1024), Some(768), None, None, N, N, N),
      (6L, jpg, Some(800), Some(600), None, None, N, N, N),
      (7L, truncatedPng, N, N, None, None, N, N, N),
      (8L, notMedia, N, N, None, None, N, N, N),
      (9L, webpLossy, Some(160), Some(120), None, None, N, N, N),
      (10L, webpLossless, Some(100), Some(80), None, None, N, N, N),
      (11L, webpExtended, Some(4000), Some(3000), None, None, N, N, N),
      (12L, tiffLe, Some(640), Some(480), None, None, N, N, N),
      (13L, tiffBe, Some(640), Some(480), None, None, N, N, N),
      (14L, truncatedWebp, N, N, None, None, N, N, N),
      (15L, mp4Video, Some(1920), Some(1080), Some("mp4"), Some(90000L), N, N, N),
      (16L, mp4Audio, N, N, Some("mp4"), Some(90000L), N, N, N),
      (17L, mp4NoMoov, N, N, None, None, N, N, N),
      (18L, wavStereo, N, N, Some("wav"), Some(1000L), Some(44100), Some(2), Some(16)),
      (19L, wavMono, N, N, Some("wav"), Some(2000L), Some(16000), Some(1), Some(16)),
      (20L, wavZeroRate, N, N, Some("wav"), None, Some(44100), Some(2), Some(16)),
      (21L, wavShell, N, N, None, None, N, N, N),
      // FLAC STREAMINFO: 44.1 kHz stereo 16-bit, one second of samples;
      // a 96 kHz mono 24-bit stream whose total-samples field is the
      // spec's 0 = unknown (duration absent, structure still reported)
      (22L, flac(44100, 2, 16, 44100L), N, N,
        Some("flac"), Some(1000L), Some(44100), Some(2), Some(16)),
      (23L, flac(96000, 1, 24, 0L), N, N,
        Some("flac"), None, Some(96000), Some(1), Some(24)))
    import spark.implicits._
    rows.toDF("media_id", "bytes", "expected_width", "expected_height",
      "expected_container", "expected_duration_ms", "expected_sample_rate",
      "expected_channels", "expected_bit_depth")
  }
}

/** Byte-level builders for hand-crafted media containers — ONE
  * definition shared by [[Tables.mediaFixture]] and the
  * container-parsing specs (MultiModalSpec, GraftFunctionsSpec), so a
  * layout fix (box emission, endianness) cannot drift between the
  * fixture and the tests that interpret it. */
private[graft] object MediaBytes {
  def blob(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
  def le16(v: Int): Array[Byte] = blob(v & 0xff, (v >> 8) & 0xff)
  def le32(v: Long): Array[Byte] =
    blob((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
  def be32(v: Long): Array[Byte] =
    blob(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)

  /** ISO-BMFF uint32-size box: `size fourcc payload`. */
  def box4(tp: String, payload: Array[Byte]): Array[Byte] = {
    val sz = 8 + payload.length
    blob((sz >>> 24) & 0xff, (sz >>> 16) & 0xff, (sz >>> 8) & 0xff, sz & 0xff) ++
      tp.getBytes ++ payload
  }

  /** Canonical PCM WAV `fmt ` chunk (16-byte payload). */
  def wavFmt(channels: Int, rate: Int, byteRate: Int, bits: Int): Array[Byte] =
    "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(byteRate) ++ le16(if (rate == 0) 0 else byteRate / rate) ++ le16(bits)

  /** RIFF/WAVE container around `chunks`; the size field covers exactly
    * what is present (use hand-rolled headers to model streamed /
    * mis-declared files). */
  def wavFile(chunks: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks

  /** Minimal FLAC: magic + a last-flag STREAMINFO first block (the
    * spec-mandated layout) carrying the given figures; `totalSamples`
    * 0 = unknown per spec, ≤ 2³⁶−1. `firstBlockType` overrides the block
    * type to model a malformed stream whose first block is not
    * STREAMINFO. */
  def flac(
      sampleRate: Int,
      channels: Int,
      bits: Int,
      totalSamples: Long,
      firstBlockType: Int = 0): Array[Byte] = {
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10 // min/max block size 4096 (any legal value)
    si(10) = ((sampleRate >>> 12) & 0xff).toByte
    si(11) = ((sampleRate >>> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) | ((bits - 1) >>> 4)).toByte
    si(13) = ((((bits - 1) & 0xf) << 4) | ((totalSamples >>> 32) & 0xf).toInt).toByte
    si(14) = ((totalSamples >>> 24) & 0xff).toByte
    si(15) = ((totalSamples >>> 16) & 0xff).toByte
    si(16) = ((totalSamples >>> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    "fLaC".getBytes ++ blob(0x80 | firstBlockType, 0, 0, 34) ++ si
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One doc's membership in one MinHash band bucket (the unit of streaming
  * near-dup state): `sig` is the FULL signature so candidate pairs carry
  * an unbiased similarity estimate, not just the matching band. `ts` is
  * the event time (NULL in the unwatermarked regime) — kept as a real
  * timestamp COLUMN so a watermark can ride through the projection into
  * the stateful operator. */
case class BandedDoc(
    id: Long, band: Int, bucket: Long, sig: Seq[Long], ts: java.sql.Timestamp)

/** A streaming near-dup candidate: `est_jaccard` is the MinHash estimate
  * (fraction of agreeing signature positions; E[est] = true Jaccard). */
case class NearDupCand(id1: Long, id2: Long, est_jaccard: Double)

/** Retained members of one (band, bucket) — bounded by `maxBucket`. */
case class BucketState(members: Seq[BandedMember])
case class BandedMember(id: Long, sig: Seq[Long])

/** Streaming near-duplicate candidate detection — the continuous flavor
  * of [[graft.ops.NearDup.minhashCandidatePairs]] for ingest-time
  * pipelines (near-dups of anything seen before are flagged as documents
  * ARRIVE, instead of re-running the batch self-join per snapshot).
  *
  * Same candidate contract as the batch operator: two docs are a
  * candidate iff some MinHash band hashes them to the same bucket
  * (banding expression shared verbatim, so stream and batch agree).
  * Each emitted pair carries the signature-agreement estimate of its
  * Jaccard — the full text of prior documents is NOT retained, so exact
  * verification stays a batch concern ([[graft.ops.NearDup
  * .jaccardVerify]] over the flagged ids); the estimate is what a
  * streaming gate acts on.
  *
  * Scale shape: state lives per (band, bucket) — `bands` signatures per
  * document (`bands × perms × 8` bytes ≈ 8 KB/doc at the defaults),
  * hash-partitioned across executors like any keyed state. `maxBucket`
  * caps any one bucket: a bucket that fills is boilerplate-like (its
  * members were already mutually flagged as they arrived); later
  * arrivals still match against the retained members but are not added.
  * The same pair can surface from several bands and several batches,
  * always with the IDENTICAL estimate (it is a pure function of the two
  * full signatures) — dedupe downstream where it matters.
  */
object NearDupStream {

  /** Per-doc banded signatures — the same projection
    * [[graft.ops.NearDup.minhashCandidatePairs]] self-joins on, emitted
    * as one row per (doc, band). Works on batch or streaming input. */
  def bandedSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      tsCol: Option[String] = None): Dataset[BandedDoc] = {
    import df.sparkSession.implicits._
    val ts = tsCol.map(col).getOrElse(lit(null).cast("timestamp"))
    df
      // a NULL id dies in BandedDoc's primitive-Long encoder, and a
      // NULL event time (which the watermark late-filter KEEPS — its
      // predicate is NULL) NPEs at d.ts.getTime inside the state fold,
      // crash-looping the query on the same poison row from the
      // checkpoint (r20 review finding). A doc without identity or —
      // on the watermarked flavor — without event time is not data.
      .filter(col(idCol).isNotNull &&
        tsCol.map(c => col(c).isNotNull).getOrElse(lit(true)))
      .select(col(idCol).as("id"),
        graft.ops.NearDup.shingles(col(textCol), k).as("__sh"), ts.as("ts"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"),
        graft.ops.NearDup.minhashSignature(col("__sh"), bands * rowsPerBand).as("sig"),
        col("ts"))
      .select(
        col("id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit("band"), lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)),
        col("sig"), col("ts"))
      .toDF("id", "band", "bucket", "sig", "ts")
      .as[BandedDoc]
  }

  /** Candidate pairs of each arriving document against everything
    * retained in its buckets, with the MinHash Jaccard estimate. Update
    * output mode; no timeout (ksqlDB-TABLE-like unbounded regime — see
    * [[candidatePairsWithinWatermark]] for the bounded-state flavor). */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = 64): Dataset[NearDupCand] = {
    import df.sparkSession.implicits._
    bandedSignatures(df, idCol, textCol, k, bands, rowsPerBand)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupCand](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
          val known = scala.collection.mutable.Set(members.map(_.id): _*)
          val out = Vector.newBuilder[NearDupCand]
          // deterministic intra-batch order so re-executed tasks emit
          // identical results regardless of upstream row order
          rows.toVector.sortBy(_.id).foreach { d =>
            if (!known.contains(d.id)) {
              members.foreach { m =>
                val agree = m.sig.iterator.zip(d.sig.iterator).count { case (a, b) => a == b }
                val est = agree.toDouble / d.sig.length
                out += (if (m.id < d.id) NearDupCand(m.id, d.id, est)
                        else NearDupCand(d.id, m.id, est))
              }
              known += d.id
              if (members.length < maxBucket) members :+= BandedMember(d.id, d.sig)
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** Bounded-state flavor, mirroring
    * [[DedupStream.dedupWithinWatermark]]: a bucket whose newest member
    * is older than the watermark horizon EXPIRES (event-time timeout),
    * so state is bounded by the horizon and near-dups farther apart in
    * time than `delay` are NOT flagged — the honest 100 TB-stream
    * trade-off (crawler re-fetches and retry storms are near-in-time; a
    * periodic batch [[graft.ops.NearDup.minhashNearDupPairs]] pass
    * handles long-range duplicates). `tsCol` must be a TimestampType
    * event-time column; `delay` is a calendar-interval string. */
  def candidatePairsWithinWatermark(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      delay: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = 64): Dataset[NearDupCand] = {
    import df.sparkSession.implicits._
    val delayMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    val horizonMs =
      delayMs.days * 86400000L + delayMs.microseconds / 1000L
    require(delayMs.months == 0, "calendar months are not a fixed horizon; use days/hours")
    // watermark on the PROJECTED ts so the watermarked column reaches the
    // stateful operator (event-time timeout requires it in its child)
    bandedSignatures(df, idCol, textCol, k, bands, rowsPerBand, tsCol = Some(tsCol))
      .withWatermark("ts", delay)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupCand](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
            val known = scala.collection.mutable.Set(members.map(_.id): _*)
            val out = Vector.newBuilder[NearDupCand]
            var maxTs = Long.MinValue
            rows.toVector.sortBy(_.id).foreach { d =>
              maxTs = math.max(maxTs, d.ts.getTime)
              if (!known.contains(d.id)) {
                members.foreach { m =>
                  val agree =
                    m.sig.iterator.zip(d.sig.iterator).count { case (a, b) => a == b }
                  val est = agree.toDouble / d.sig.length
                  out += (if (m.id < d.id) NearDupCand(m.id, d.id, est)
                          else NearDupCand(d.id, m.id, est))
                }
                known += d.id
                if (members.length < maxBucket) members :+= BandedMember(d.id, d.sig)
              }
            }
            state.update(BucketState(members))
            // expire when the watermark passes the bucket's newest event
            // plus the horizon — the same bound dropDuplicatesWithinWatermark
            // keeps for its fingerprints. A wholly-late batch could place
            // that below the current watermark (invalid): clamp forward.
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}

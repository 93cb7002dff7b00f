package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.Windowing

/** Randomized event row for the window-operator properties (top-level
  * for encoders). */
case class WEv(key: Long, ts_ns: Long, seq: Long, v: Double)

/** ScalaCheck properties for the round-12 window operators: trailing
  * RANGE-frame stats and per-window top-N against plain-Scala models on
  * random keyed event streams — ties, NaN rows, and frame boundaries
  * included by construction (small key/time spaces force collisions). */
object WindowingProps extends Properties("Windowing12") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val windowNs = 100L
  private val widthSeconds = 1L // windowTopN: 1e9 ns buckets

  private val genEvents: Gen[List[WEv]] = for {
    n <- Gen.chooseNum(1, 40)
    keys <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    // small time space → same-ts peers and frame-boundary hits are common
    tss <- Gen.listOfN(n, Gen.chooseNum(0L, 400L))
    vals <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.chooseNum(-50.0, 50.0),
      1 -> Gen.const(Double.NaN)))
  } yield keys.lazyZip(tss).lazyZip(vals).lazyZip(1L to n.toLong).map {
    case (k, t, v, seq) => WEv(k, t, seq, v)
  }.toList

  private def finite(v: Double): Boolean = !v.isNaN && math.abs(v) < Double.PositiveInfinity

  property("rollingStats equals the per-row trailing-frame model") =
    Prop.forAll(genEvents) { events =>
      import spark.implicits._
      val got = Windowing
        .rollingStats(events.toDF("key", "ts_ns", "seq", "v"), "key", "ts_ns", "seq", "v", windowNs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          ((r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
        .toMap
      val model = events.map { e =>
        val frame = events.filter(o =>
          o.key == e.key && o.ts_ns >= e.ts_ns - windowNs && o.ts_ns <= e.ts_ns &&
            finite(o.v))
        val n = frame.size.toLong
        val sum =
          if (n == 0) None
          else Some(frame
            .map(o => java.math.BigDecimal.valueOf(o.v).setScale(6, java.math.RoundingMode.HALF_UP))
            .reduce(_ add _).doubleValue())
        (e.key, e.ts_ns, e.seq) -> ((n, sum))
      }.toMap
      got == model
    }

  property("windowTopN equals the per-cell rank model") =
    Prop.forAll(genEvents, Gen.chooseNum(1, 4)) { (events, k) =>
      import spark.implicits._
      val widthNs = widthSeconds * 1000000000L
      // stretch the 0..400 time space across ~5 buckets so the bucketing
      // actually partitions (the rolling property wants the tight space)
      val stretched = events.map(e => e.copy(ts_ns = e.ts_ns * 13000000L))
      val got = Windowing
        .windowTopN(
          stretched.toDF("key", "ts_ns", "seq", "v")
            .select(col("ts_ns"), col("key").cast("string").as("key"), col("seq"), col("v")),
          "ts_ns", widthSeconds, Seq("key"), "v", "seq", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .toSeq
      val m = stretched
        .filter(e => finite(e.v))
        .groupBy(e => (Math.floorDiv(e.ts_ns, widthNs), e.key.toString))
        .toSeq
        .flatMap { case ((b, key), rs) =>
          rs.sortBy(r => (-r.v, r.seq)).take(k).zipWithIndex.map { case (r, i) =>
            (b * widthSeconds, key, i + 1, r.seq)
          }
        }
        .sortBy(t => (t._1, t._2, t._3))
      got == m
    }
}

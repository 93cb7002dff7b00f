package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (sessions are expensive;
  * every suite reuses this one). Config matches GraftSession.local — the
  * same confs the Verify/Bench entry points pin. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cores = 4)
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}

/** Top-level (encoder-codegen-friendly) changelog event used by the
  * changelog suites: `event_id` is the global sequence (Kafka-offset
  * stand-in), `user_id` the changelog key. */
case class Ev(user_id: Long, event_id: Long, event_type: String, value: Double)

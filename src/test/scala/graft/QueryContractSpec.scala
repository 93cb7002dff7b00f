package graft

/** The declared-query contract the driver's oracle compare rests on:
  * every `SparkEntry.queries` entry must execute and must be
  * DETERMINISTIC — two executions produce identical rows in identical
  * order (the driver hashes dumped rows; a nondeterministic order or a
  * run-dependent value would fail the gate even with correct content).
  * Runs at sf0.001 so the whole surface stays cheap. */
class QueryContractSpec extends SparkTestBase {

  test("every declared query executes twice with identical ordered results") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val a = fn(spark, sf001).collect().toSeq
          val b = fn(spark, sf001).collect().toSeq
          if (a == b) None
          else Some(s"$name: nondeterministic (${a.length} vs ${b.length} rows or order/values differ)")
        } catch {
          case e: Throwable => Some(s"$name: failed with ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every declared query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${q -- o}; orphaned oracles: ${o -- q}")
  }

  test("the flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }
}

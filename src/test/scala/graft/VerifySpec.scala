package graft

/** The driver-resilience contract of the correctness dump
  * ([[Verify.run]]) — previously re-probed by hand each round (the
  * verify skill's "bad dir" check), now pinned:
  *
  *  - a bad data dir fails EVERY query individually (stderr lines),
  *    never aborts the run, and still writes oracle_sql.json — the
  *    driver's compare must see a complete oracle map even when the
  *    dumps are missing (it records per-query errors, not a dead round);
  *  - the oracle JSON survives a strict parser with every declared key,
  *    including control-character escaping in builder-authored SQL;
  *  - a focused good run dumps readable parquet for the named query.
  */
class VerifySpec extends SparkTestBase {

  test("wrong arity names the usage instead of a bare MatchError (r20)") {
    val e = intercept[RuntimeException](Verify.main(Array("/only/one/arg")))
    assert(e.getMessage.contains("usage: graft.Verify"), e.getMessage)
    val e0 = intercept[RuntimeException](Verify.main(Array.empty))
    assert(e0.getMessage.contains("usage"), e0.getMessage)
  }

  test("a bad data dir skips every query but still writes a parseable oracle_sql.json") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-bad").toString
    val errBuf = new java.io.ByteArrayOutputStream()
    // limit to a handful of queries: the contract is per-query isolation,
    // not the 118-wide sweep (the driver runs that; QueryContractSpec
    // runs the full surface on good data)
    val some = Set("q_count", "q_project", "q_neardup_jaccard")
    Console.withErr(new java.io.PrintStream(errBuf)) {
      val priorErr = System.err
      System.setErr(new java.io.PrintStream(errBuf))
      try Verify.run(spark, "/nonexistent/dir", out, Some(some))
      finally System.setErr(priorErr)
    }
    val err = errBuf.toString
    some.foreach { n =>
      assert(err.contains(s"[verify] $n failed"), s"missing failure line for $n in: $err")
    }
    // the oracle dump is written regardless, and parses strictly
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.isObject)
    assert(node.size() == SparkEntry.oracleSql.size,
      "every declared oracle must survive the escape into strict JSON")
    SparkEntry.oracleSql.keys.foreach(k => assert(node.has(k), s"oracle missing $k"))
    // and the escaping preserved each SQL string byte-for-byte
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(node.get(k).asText() == v, s"oracle SQL for $k mangled by the escape")
    }
  }

  test("a focused good run dumps readable parquet for exactly the named queries") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-good").toString
    Verify.run(spark, sf001, out, Some(Set("q_count")))
    val dumped = spark.read.parquet(s"$out/q_count")
    assert(dumped.count() > 0)
    // no un-named query leaked a directory
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSeq == Seq("q_count"), dirs.mkString(","))
  }
}

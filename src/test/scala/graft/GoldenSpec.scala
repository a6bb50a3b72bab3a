package graft

/** Regression goldens for the queries the DuckDB oracle can't check
  * (declared rows-only in SURVEY §2): their canonical content
  * fingerprint at sf0.001 must match the recorded value, so a silent
  * semantic change — wrong hash constant, broken shingling, shifted
  * bucket layout — fails here instead of sailing through a rows-only
  * count check. Re-record via `runMain graft.Goldens` after an
  * INTENTIONAL semantic change.
  */
class GoldenSpec extends SparkSuite {

  private val golden = Goldens.expected("sf0.001")

  for ((name, (exclude, dp)) <- Goldens.rowsOnly.toSeq.sortBy(_._1))
    test(s"$name matches its recorded sf0.001 content fingerprint") {
      val fp = Goldens.fingerprint(SparkEntry.queries(name)(spark, sf), exclude, dp)
      assert(golden.get(name).contains(fp),
        s"$name drifted: fingerprint $fp != recorded ${golden.get(name)}; " +
          "if the change was intentional, re-record with runMain graft.Goldens")
    }

  test("every rows-only query has a recorded golden at both verify SFs") {
    for (sfName <- Seq("sf0.001", "sf0.01"))
      assert(Goldens.rowsOnly.keySet.subsetOf(Goldens.expected(sfName).keySet),
        s"missing goldens at $sfName")
  }
}

package graft

class QueriesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has oracle SQL or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed, but oracle keys must all exist
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      s"oracleSql keys without queries: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
    info(s"rows-only queries (no oracle): ${noOracle.toSeq.sorted.mkString(", ")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's snapshot-survivable compact summary line: it must
  * stay inside [[Bench.CompactLineBudget]] chars over the REAL query
  * surface (the round driver keeps only a 2000-char stdout tail; the
  * budget leaves room for the tail to also hold stderr noise), emit
  * locale-independent JSON, and carry a metric key distinct from the
  * full line's so key-matching consumers never confuse the two shapes.
  * No SparkSession needed — the line builder is pure. */
class BenchLineSpec extends AnyFunSuite {

  // worst realistic inputs: the 8 LONGEST names on the live surface
  // (the slowest set is arbitrary, so budget against the widest), a
  // 6-digit total with full double precision, TB-scale spill counters
  private def worstCaseLine: String = {
    val longest = SparkEntry.queries.keys.toSeq.sortBy(-_.length).take(8)
      .map(_ -> 99999.99499999999)
    Bench.compactLine(
      total = 999999.9999999999, sfDir = "/root/testdata/sf0.1",
      nQueries = SparkEntry.queries.size, nOk = SparkEntry.queries.size,
      nErrors = 99, memSpill = 9999999999999L, diskSpill = 9999999999999L,
      slowest = longest)
  }

  test("compact line fits the snapshot budget over the real surface") {
    val line = worstCaseLine
    assert(line.length <= Bench.CompactLineBudget,
      s"compact line grew to ${line.length} chars (> ${Bench.CompactLineBudget}): " +
        "it would no longer be complete inside the driver's 2000-char " +
        s"stdout tail once stderr shares the window. Line: $line")
  }

  test("compact line is valid JSON under a comma-decimal locale") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.FRANCE)
    try {
      val line = worstCaseLine
      // a locale-leaking %.2f would render 99999,99 — JSON with a bare
      // comma inside a number. Minimal structural check without a JSON
      // lib: the slowest map's values must contain '.'-decimals only.
      assert(!line.matches(""".*"q[^"]*":\d+,\d.*"""),
        s"comma-decimal leaked into the compact line: $line")
      // and it must round-trip through Spark's bundled Jackson parser
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(line)
      assert(node.get("metric").asText() == "total_compact")
      assert(node.get("slowest").size() == 8)
    } finally java.util.Locale.setDefault(prev)
  }

  test("compact metric key is distinct from the full line's") {
    // the full artifact line carries "metric":"total" (the documented
    // contract bench_compare.py greps); the compact line must NOT, or
    // a consumer matching on the key alone picks either schema
    assert(worstCaseLine.contains(""""metric":"total_compact""""))
    assert(!worstCaseLine.contains(""""metric":"total""""))
  }
}

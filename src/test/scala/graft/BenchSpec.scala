package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout contract: the line the driver parses must stay
  * inside its stdout tail-capture window no matter how many queries the
  * engine grows (rounds 2 and 3 shipped unparseable BENCH output because
  * the full per-query map pushed the line head out of the window).
  */
class BenchSpec extends AnyFunSuite {

  private def fakeResults(n: Int, failing: Int = 0): Seq[(String, Double, Boolean)] =
    (1 to n).map { i =>
      (f"q_synthetic_query_name_$i%03d", i * 1.234, i > failing)
    }

  test("stdout line stays under the budget at 2x the current query count") {
    val n = SparkEntry.queries.size * 2
    val line = Bench.stdoutLine(fakeResults(n), "sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.LineBudgetBytes,
      s"line is ${line.length}B for $n queries: $line")
  }

  test("stdout line stays under the budget when every query fails") {
    val n = SparkEntry.queries.size * 2
    val line = Bench.stdoutLine(fakeResults(n, failing = n), "sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.LineBudgetBytes,
      s"line is ${line.length}B: $line")
    assert(line.contains("\"nerrors\":" + n))
  }

  test("stdout line is valid JSON shape with total first and slowest map") {
    val line = Bench.stdoutLine(fakeResults(30, failing = 2), "sf0.01")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains("\"sf\":\"sf0.01\""))
    assert(line.contains("\"nqueries\":30"))
    // failed queries surface on the line via the -1 sentinel
    assert(line.contains("\"q_synthetic_query_name_001\":-1"))
    assert(line.contains("\"q_synthetic_query_name_002\":-1"))
    // slowest successful query made the cut
    assert(line.contains("\"q_synthetic_query_name_030\":37.02"))
    assert(line.endsWith("}"))
  }

  test("full json carries every query") {
    val full = Bench.fullJson(fakeResults(126), "sf0.1")
    assert((1 to 126).forall(i => full.contains(f"q_synthetic_query_name_$i%03d")))
  }
}

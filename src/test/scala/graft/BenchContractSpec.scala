package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the LAST ~2000 chars of Bench stdout; a line
  * over budget parses as NOTHING (the round-2 failure: the whole bench
  * round was lost to a long line). These tests pin the rendering ladder so
  * suite growth can never silently re-break the contract.
  */
class BenchContractSpec extends AnyFunSuite {

  test("bench stdout line stays inside the driver's tail budget at 160 queries") {
    // worst-case shape: long full names (shortened to the qNNN prefix),
    // 3-digit-second values, every query slow enough to keep 2 decimals
    val results = (1 to 160).map(i =>
      (f"q$i%03d_some_long_operator_name", 123.45678))
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars, budget ${Bench.LineBudget}")
    // headline fields must sit at the END so a front-truncated tail keeps them
    assert(line.endsWith("\"unit\":\"sec\"}"), line.takeRight(80))
    assert(line.contains("\"metric\":\"total\""), line.takeRight(120))
    assert(!line.contains("\n") && line.startsWith("{"))
  }

  test("bench stdout line keeps every query key at the current suite scale") {
    val n = SparkEntry.defs.size
    val results = (1 to n).map(i => (f"q$i%03d_x", 1.23))
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars at the current $n-query scale")
    assert((1 to n).forall(i => line.contains(f""""q$i%03d":""")),
      "per-query entries must survive at the current suite size")
  }

  test("failed queries surface in the line, never shrink the total silently") {
    val results = Seq(("q01_ok", 1.0), ("q02_bad", -1.0))
    val line = Bench.stdoutLine(results, Seq("q02_bad"), "/tmp/sf")
    assert(line.contains(""""failed":["q02_bad"]"""), line)
    assert(line.contains(""""value":1.00"""), line)
    assert(line.contains(""""q02":-1"""), line)
  }
}

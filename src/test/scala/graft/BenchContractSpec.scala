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

  test("bench stdout line keeps the slow tail at the current suite scale") {
    // Real suite-shaped input: the REAL query names (so short keys have
    // their true widths) with a REALISTIC slow density (~1 in 8 rows ≥1s,
    // matching observed idle runs — an all-slow suite is physically
    // unrenderable in 1900 chars and is covered by the prefix test
    // below). Past ~160 queries the full table no longer fits the tail
    // budget; the dynamic rung must keep the line parseable, keep EVERY
    // slow query itemized, and reconcile the dropped mass through
    // "other".
    val names = SparkEntry.defs.map(_.name).sorted
    val n = names.size
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, if (i % 8 == 0) 1.0 + (i % 40) * 0.25 else 0.1 + (i % 9) * 0.05) }
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars at the current $n-query scale")
    // every query slower than 1s must be itemized (the gate's slow tail)
    val slow = results.filter(_._2 >= 1.0)
    val missing = slow.filterNot { case (nm, _) =>
      line.contains("\"" + nm.takeWhile(_ != '_') + "\":") }
    assert(missing.isEmpty, s"slow queries dropped from the line: ${missing.take(5)}")
    // itemized + other must reproduce the headline total (±rounding:
    // each itemized value rounds at 1 decimal, so the bound scales with n)
    if (line.contains("\"other\":")) {
      val qs = """"q[0-9]+[a-z]?":([0-9.]+)""".r
        .findAllMatchIn(line).map(_.group(1).toDouble).toSeq
      val other = """"other":([0-9.]+)""".r
        .findFirstMatchIn(line).get.group(1).toDouble
      val total = """"value":([0-9.]+)""".r
        .findFirstMatchIn(line).get.group(1).toDouble
      assert(math.abs(qs.sum + other - total) < 0.05 * n + 0.2,
        s"itemized ${qs.sum} + other $other != total $total")
    }
  }

  test("under an unrenderably dense slow tail, the kept set is the slowest prefix") {
    // Adversarial shape: ~90% of the suite ≥1s — more slow rows than the
    // 1900-char window can hold. The rung may fold, but what survives
    // must be exactly the SLOWEST rows: no itemized row may be faster
    // than any dropped one (a dropped 9s row behind a kept 1.1s row
    // would hide the very rows the per-query gate inspects first).
    val names = SparkEntry.defs.map(_.name).sorted
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 + (i % 40) * 0.25) } // 0.1 .. 9.85s mix
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars")
    val kept = results.filter { case (nm, _) =>
      line.contains("\"" + nm.takeWhile(_ != '_') + "\":") }
    val dropped = results.filterNot { case (nm, _) =>
      line.contains("\"" + nm.takeWhile(_ != '_') + "\":") }
    assert(kept.nonEmpty && dropped.nonEmpty, "mix should overflow the budget")
    val minKept = kept.map(_._2).min
    val maxDropped = dropped.map(_._2).max
    assert(maxDropped <= minKept,
      s"dropped a ${maxDropped}s row while keeping a ${minKept}s row")
  }

  test("memo attribution + slow-tail sentinels fit the budget at the current suite scale") {
    // r8 verdict task 1: the DRIVER-visible line carries "memo" (per
    // first-payer build seconds) and "sent" (per-slow-query sentinel) so
    // cold-vs-warm and contention are readable without BENCH_SELF.json.
    // Worst case: every memo family pays, the whole slow tail is listed.
    val names = SparkEntry.defs.map(_.name).sorted
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 + (i % 40) * 0.25) }
    val slow = results.filter(_._2 >= 1.0)
    val memo = results.filter(_._2 >= 3.0).take(12)
      .map { case (nm, _) => (nm, 1.2345) }
    val sent = slow.map { case (nm, _) => (nm, 0.1234) }
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1",
      0.1, memo, sent)
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars with memo+sent maps")
    assert(line.contains("\"memo\":{"), line.take(200))
    assert(line.contains("\"sent\":{"), line)
    // every memo attribution must survive (that's the point of the task)
    memo.foreach { case (nm, _) =>
      val k = "\"" + nm.takeWhile(_ != '_') + "\":1.23"
      assert(line.split("\"memo\":", 2)(1).contains(k),
        s"memo entry $k dropped")
    }
    assert(line.endsWith("\"unit\":\"sec\"}"), line.takeRight(80))
  }

  test("the par (all-core sentinel) map and par_med survive the budget " +
      "ladder: hottest 12 probes itemized, line parseable") {
    val names = SparkEntry.defs.map(_.name).sorted
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 + (i % 40) * 0.25) }
    val slow = results.filter(_._2 >= 1.0)
    val sent = slow.map { case (nm, _) => (nm, 0.1234) }
    // every query carries a par probe; a contended stretch shows as a
    // few hot readings — those exact rows must be itemized
    val par = results.zipWithIndex.map { case ((nm, _), i) =>
      (nm, if (i % 97 == 0) 0.456 else 0.034) }
    val hot = par.filter(_._2 > 0.1).map(_._1)
      .map(nm => "\"" + nm.takeWhile(_ != '_') + "\":0.456")
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1",
      0.1, Nil, sent, par, 0.034)
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars with the par map")
    assert(line.contains("\"par\":{"), line.take(200))
    assert(line.contains("\"par_med\":0.034"), line.takeRight(120))
    val parJson = line.split("\"par\":", 2)(1)
    hot.take(12).foreach(k =>
      assert(parJson.contains(k), s"hot par entry $k dropped"))
  }

  test("per-row par evidence is complete from the line alone: elevated " +
      "probes itemized, every unlisted row pinned by par_flat_max") {
    // r15 verdict task 3: attributing a slow row's par sentinel must not
    // require BENCH_SELF.json. Encoding: probes > 4/3 × par_med are
    // listed with values; par_flat_max bounds ALL unlisted probes.
    val names = SparkEntry.defs.map(_.name).sorted
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 + (i % 40) * 0.25) }
    val par = results.zipWithIndex.map { case ((nm, _), i) =>
      (nm, if (i % 97 == 0) 0.456 else 0.030 + (i % 7) * 0.001) }
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1",
      0.1, Nil, Nil, par, 0.033)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    // every elevated probe (0.456 > 4/3 × 0.033) is itemized
    val parJson = line.split("\"par\":", 2)(1).split("},", 2)(0)
    par.filter(_._2 > 0.1).foreach { case (nm, _) =>
      assert(parJson.contains("\"" + nm.takeWhile(_ != '_') + "\":0.456"),
        s"elevated probe $nm dropped") }
    // no flat probe is itemized; the flat bound covers them all instead
    assert(!parJson.contains(":0.03"), parJson.take(200))
    val flatMax = """"par_flat_max":([0-9.]+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    val unlisted = par.filter(_._2 <= 0.1).map(_._2)
    assert(flatMax >= unlisted.max && flatMax < 0.1,
      s"par_flat_max $flatMax must bound exactly the unlisted probes")
  }

  test("throttle + sustained instrumentation renders inside the budget") {
    // r15 verdict task 1: per-query cgroup throttle deltas (nonzero rows
    // itemized, thr_n = suite total) and the 3 sustained all-core probe
    // readings, all from the stdout line alone
    val names = SparkEntry.defs.map(_.name).sorted
    val results = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 + (i % 40) * 0.25) }
    val sentSlow = results.filter(_._2 >= 1.0).map { case (nm, _) => (nm, 0.1) }
    val par = results.map { case (nm, _) => (nm, 0.034) }
    val thr = results.zipWithIndex.map { case ((nm, _), i) =>
      (nm, if (i % 101 == 0) 1.234 else 0.0) }
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1",
      0.1, Nil, sentSlow, par, 0.034, thr, 42L, Seq(1.21, 1.19, 1.25))
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains("\"thr_n\":42"), line.takeRight(300))
    assert(line.contains("\"sus\":[1.21,1.19,1.25]"), line.takeRight(400))
    val thrJson = line.split("\"thr\":", 2)(1)
    thr.filter(_._2 > 0).foreach { case (nm, _) =>
      assert(thrJson.contains("\"" + nm.takeWhile(_ != '_') + "\":1.234"),
        s"throttled row $nm dropped") }
  }

  test("dynamic rung keeps strictly more queries than the old fixed-110 cut") {
    // 200 synthetic queries with 4-char keys — deep into rung-3 territory;
    // the fit-max-K walk must retain well over 110 itemized entries
    val results = (1 to 200).map(i => (f"q$i%03d_x", 0.31))
    val line = Bench.stdoutLine(results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget)
    val kept = """"q[0-9]{3}":""".r.findAllIn(line).size
    assert(kept > 110, s"only $kept itemized entries survived")
  }

  test("failed queries survive the dynamic cut even when they'd sort fastest") {
    val ok = (1 to 200).map(i => (f"q$i%03d_x", 5.0))
    val results = ok :+ ("q999_broken", -1.0)
    val line = Bench.stdoutLine(results, Seq("q999_broken"), "/tmp/sf")
    assert(line.length <= Bench.LineBudget)
    assert(line.contains(""""q999":-1"""), "failure marker must never be dropped")
    assert(line.contains(""""failed":["q999_broken"]"""))
  }

  test("failed queries surface in the line, never shrink the total silently") {
    val results = Seq(("q01_ok", 1.0), ("q02_bad", -1.0))
    val line = Bench.stdoutLine(results, Seq("q02_bad"), "/tmp/sf")
    assert(line.contains(""""failed":["q02_bad"]"""), line)
    assert(line.contains(""""value":1.00"""), line)
    assert(line.contains(""""q02":-1"""), line)
  }
}

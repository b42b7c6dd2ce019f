package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout summary line's TAIL CONTRACT (r13 verdict
  * item 2): the driver captures only ~2000 trailing characters of the
  * bench process's output, so the one-line summary must stay under
  * 1800 bytes even FULLY POPULATED — every headline lane timed, every
  * registered scale exponent present, every probe flagged polluted,
  * all harness metrics real, a worst-case skip list. Rounds 3–12
  * shipped a compact line that silently outgrew the tail ("parsed":
  * null at rc 0 every round); this spec makes the regression a test
  * failure instead of a post-round forensic finding. No SparkSession
  * needed — the builder is a pure string function.
  */
class BenchContractSpec extends AnyFunSuite {

  private def worstCaseLine: String = {
    // worst realistic widths: 5-digit totals, 4-digit lane seconds,
    // negative exponents, every probe polluted, every optional stage
    // skipped, a deep record path
    val harness = Bench.harnessJsonStr(99999.999, 99999.9, 99999.9,
      99999.9, 99999.9, 99999.9, 99999.9, 99999.9, 99999.9, 99999.9,
      99999.9)
    Bench.summaryLine(
      total = 99999.99,
      sf = "/root/testdata/sf0.1",
      iters = 3,
      lanes = 999,
      failed = Seq("a_reasonably_long_lane_name", "another_failed_lane"),
      skippedJson = Seq("pass3_tail", "retry", "sf_small", "harness",
        "probes_partial", "terasort_sf1")
        .map("\"" + _ + "\"").mkString("[", ",", "]"),
      elapsedSec = 99999.9,
      headlineVals = Bench.headlineLanes.map(_ -> "9999.999"),
      exponents = Bench.allProbeLabels.map(_ -> "-0.999"),
      pollutedJson = Bench.allProbeLabels
        .map("\"" + _ + "\"").mkString("[", ",", "]"),
      harnessJson = harness,
      fullRecord = "/tmp/graft-bench-record/bench_out.json")
  }

  test("fully-populated summary line fits the driver's ~2000-char tail with headroom") {
    val line = worstCaseLine
    val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes < 1800,
      s"summary line is $bytes bytes — over the 1800-byte tail budget; " +
        "trim headlineLanes or shorten field names before shipping " +
        s"(line: $line)")
  }

  test("summary line parses as JSON and carries every exponent and headline key") {
    val line = worstCaseLine
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    val exps = root.get("exponents")
    Bench.allProbeLabels.foreach { l =>
      assert(exps.has(l), s"exponent key '$l' missing from summary line")
    }
    val qs = root.get("queries")
    Bench.headlineLanes.foreach { l =>
      assert(qs.has(l), s"headline lane '$l' missing from summary line")
    }
    Seq("lanes", "failed", "skipped", "elapsed_sec", "load_polluted",
      "terasort_sf1_sec", "device_mbps_write", "device_mbps_read",
      "full_record").foreach { k =>
      assert(root.has(k), s"summary field '$k' missing")
    }
  }

  test("every headline lane and probe label is a registered query/probe") {
    // a renamed lane would silently drop out of the summary's queries
    // map (filter(medAll.contains)) — catch the drift here
    val qnames = SparkEntry.queries.keySet
    Bench.headlineLanes.foreach { l =>
      assert(qnames.contains(l), s"headline lane '$l' is not a registered query")
    }
  }
}

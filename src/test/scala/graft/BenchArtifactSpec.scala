package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact routing (VERDICT r11 item 4): a filtered
  * dev smoke — or any run narrower than the incumbent full-suite
  * record — must land in bench_dev.json and can never replace
  * bench_latest.json (r11's full-suite record was clobbered by an
  * 11-query smoke and had to be restored by hand in git). */
class BenchArtifactSpec extends AnyFunSuite {

  test("filtered runs never target the full-suite record") {
    assert(Bench.artifactTarget(filtered = true, nQueries = 195,
      incumbentN = None) == "bench_dev.json")
    assert(Bench.artifactTarget(filtered = true, nQueries = 195,
      incumbentN = Some(11)) == "bench_dev.json")
  }

  test("a narrower unfiltered run cannot replace a wider incumbent") {
    assert(Bench.artifactTarget(filtered = false, nQueries = 180,
      incumbentN = Some(195)) == "bench_dev.json")
  }

  test("a full-suite run at or above the incumbent width replaces it") {
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195)) == "bench_latest.json")
    assert(Bench.artifactTarget(filtered = false, nQueries = 196,
      incumbentN = Some(195)) == "bench_latest.json")
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = None) == "bench_latest.json")
  }

  test("a run with errored queries never replaces the record") {
    // errors make the summed total artificially fast — third axis of
    // the clobber defect
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195), sfDir = "/d", incumbentSf = Some("/d"),
      hadErrors = true) == "bench_dev.json")
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195), sfDir = "/d", incumbentSf = Some("/d"),
      hadErrors = false) == "bench_latest.json")
  }

  test("a different scale factor never replaces the record (r12 clobber)") {
    // the exact r12 incident: full-suite verify smoke at sf0.01 vs the
    // incumbent sf0.1 record — width passes, SF must block
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195), sfDir = "/root/testdata/sf0.01",
      incumbentSf = Some("/root/testdata/sf0.1")) == "bench_dev.json")
    // same SF still replaces; no incumbent stamp doesn't block
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195), sfDir = "/root/testdata/sf0.1",
      incumbentSf = Some("/root/testdata/sf0.1")) == "bench_latest.json")
    assert(Bench.artifactTarget(filtered = false, nQueries = 195,
      incumbentN = Some(195), sfDir = "/root/testdata/sf0.1",
      incumbentSf = None) == "bench_latest.json")
  }

  test("incumbent sf stamp reads back; absent file reads None") {
    val stamped = Files.createTempFile("bench", ".json")
    Files.writeString(stamped,
      """{"metric":"total","n_queries":195,"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.incumbentSfDir(stamped).contains("/root/testdata/sf0.1"))
    assert(Bench.incumbentSfDir(
      java.nio.file.Paths.get("/nonexistent/bench.json")).isEmpty)
  }

  test("incumbent width reads the n_queries stamp, else counts legacy keys") {
    val stamped = Files.createTempFile("bench", ".json")
    Files.writeString(stamped,
      """{"metric":"total","n_queries":195,"queries":{"a":1.0}}""")
    assert(Bench.incumbentQueryCount(stamped).contains(195))

    val legacy = Files.createTempFile("bench", ".json")
    Files.writeString(legacy,
      """{"metric":"total","queries":{"q1":0.5,"q2":1.25,"q3":2.0},"samples":{}}""")
    assert(Bench.incumbentQueryCount(legacy).contains(3))

    assert(Bench.incumbentQueryCount(
      java.nio.file.Paths.get("/nonexistent/bench.json")).isEmpty)
  }
}

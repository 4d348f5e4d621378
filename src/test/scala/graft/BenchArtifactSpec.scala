package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Fail-loud guard for the committed bench artifacts (round-10 verdict
 * finding: a STALE `bench_detail.json` was committed twice while the
 * run's true detail sat in the working tree — the `detail_sha` stamp
 * in the compact line caught it, but nothing acted on it).
 *
 * [[Bench]] writes `bench_detail.sha` (first 8 bytes of
 * sha256(detail file) in hex) next to `bench_detail.json` in the same
 * run. This spec makes `sbt test` — which every round snapshot runs —
 * fail whenever the two committed files disagree, so a stale detail
 * can no longer ride a green build. A detail WITHOUT its sha is the
 * same failure mode half-open (commit the json, forget — or delete —
 * the sha, and the guard would pass silently), so that fails too;
 * the skip remains only for the fresh-clone case where BOTH are
 * absent.
 */
class BenchArtifactSpec extends AnyFunSuite {
  test("committed bench_detail.json matches its committed sha") {
    val detail = Paths.get("bench_detail.json")
    val shaFile = Paths.get("bench_detail.sha")
    if (Files.exists(detail) && !Files.exists(shaFile)) {
      fail("bench_detail.json is committed without bench_detail.sha — " +
        "recommit BOTH from the same Bench run (the sha is the " +
        "stale-artifact guard; a detail alone is unverifiable)")
    } else if (Files.exists(detail) && Files.exists(shaFile)) {
      val want = new String(Files.readAllBytes(shaFile), "UTF-8").trim
      val got = java.security.MessageDigest.getInstance("SHA-256")
        .digest(Files.readAllBytes(detail))
        .take(8).map(b => f"$b%02x").mkString
      assert(got == want,
        s"bench_detail.json (sha $got) is not the file bench_detail.sha " +
          s"records ($want): one of them is stale — recommit BOTH from " +
          "the same Bench run")
    } else succeed
  }
}

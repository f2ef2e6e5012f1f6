package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench rotation guard (VERDICT r13 item 5): a round-close driver
  * artifact `BENCH_r<N>.json` without its `bench_detail_r<N>.json` archive
  * means the load-insensitive per-query cpu channel is one overwrite from
  * unrecoverable — Bench must refuse to run until it is archived. */
class BenchGuardSpec extends AnyFunSuite {
  test("unarchivedRound flags only the latest round missing its archive") {
    val dir = java.nio.file.Files.createTempDirectory("benchguard")
    def touch(n: String): Unit =
      java.nio.file.Files.write(dir.resolve(n), "{}".getBytes)
    assert(Bench.unarchivedRound(dir, "bench_detail").isEmpty) // no rounds yet
    touch("BENCH_r05.json")
    assert(Bench.unarchivedRound(dir, "bench_detail") === Some(5))
    touch("bench_detail_r05.json")
    assert(Bench.unarchivedRound(dir, "bench_detail").isEmpty)
    touch("BENCH_r06.json") // new round-close artifact, not yet archived
    assert(Bench.unarchivedRound(dir, "bench_detail") === Some(6))
    touch("bench_detail_r06.json")
    assert(Bench.unarchivedRound(dir, "bench_detail").isEmpty)
  }
}

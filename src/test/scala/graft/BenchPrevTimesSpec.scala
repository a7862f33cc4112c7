package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.prevRoundTimes must read SECONDS, never ratios: BENCH_r20's
  * drift screen published a false 2.76x on q77 because the old parser
  * harvested the prior wrapper's drift_vs_prev/ab_retime RATIO maps as
  * per-query times, and missed every query truncated out of the
  * wrapper's ~4KB stdout tail (q21/q51 regressed unscreened).
  */
class BenchPrevTimesSpec extends AnyFunSuite {

  private def tempDir(): java.io.File = {
    val d = java.io.File.createTempFile("benchprev", "")
    d.delete(); d.mkdirs(); d.deleteOnExit(); d
  }

  private def write(dir: java.io.File, name: String, txt: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
    try w.print(txt) finally w.close()
  }

  test("prefers the intact bench_local twin's queries object over ratio maps") {
    val d = tempDir()
    // full local twin: queries in seconds, then drift ratios that must NOT leak
    write(d, "bench_local_r20.json",
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q21_minhash_pairs":1.711,"q77_incremental_dedup":3.586,"q9_topk":0.112},"sf":"/x","drift_vs_prev":{"q77_incremental_dedup":2.76,"q21_minhash_pairs":9.99},"ab_retime":{"q77_incremental_dedup":{"first":3.701,"retimed":3.586}}}""")
    // a driver wrapper also present — twin must win
    write(d, "BENCH_r20.json",
      """{"n":20,"tail":"...\"q77_incremental_dedup\":0.01},\"drift_vs_prev\":{\"q77_incremental_dedup\":2.76}"}""")
    val prev = Bench.prevRoundTimes(d)
    assert(prev("q77_incremental_dedup") == 3.586,
      s"expected seconds from the twin's queries object, got $prev")
    assert(prev("q21_minhash_pairs") == 1.711, s"ratio leaked: $prev")
    assert(prev("q9_topk") == 0.112)
  }

  test("wrapper fallback slices at drift_vs_prev so ratios never harvest") {
    val d = tempDir()
    // no twin: only the (truncated) driver wrapper, with escaped quotes
    write(d, "BENCH_r19.json",
      """{"n":19,"tail":"\"q51_split_assign\":0.317,\"q9_topk\":0.113},\"sf\":\"/x\",\"drift_vs_prev\":{\"q51_split_assign\":1.56,\"q4_join_multi\":0.66},\"ab_retime\":{\"q51_split_assign\":{\"first\":0.5,\"retimed\":0.49}}"}""")
    val prev = Bench.prevRoundTimes(d)
    assert(prev("q51_split_assign") == 0.317,
      s"expected the pre-slice seconds, got $prev")
    assert(!prev.contains("q4_join_multi"),
      s"ratio-map key harvested from beyond the slice: $prev")
  }

  test("empty directory yields empty map") {
    assert(Bench.prevRoundTimes(tempDir()).isEmpty)
  }

  test("the current round's own twin never becomes the drift reference") {
    val d = tempDir()
    // newest driver round on record = 20, so bench_local_r21 is THIS
    // round's own earlier full run — prev must stay the r20 twin, or
    // the screen compares the round to itself
    write(d, "BENCH_r20.json", """{"n":20,"tail":"..."}""")
    write(d, "bench_local_r20.json",
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q9_topk":0.112},"sf":"/x"}""")
    write(d, "bench_local_r21.json",
      """{"metric":"total","value":9.0,"unit":"sec","queries":{"q9_topk":0.999},"sf":"/x"}""")
    assert(Bench.prevRoundTimes(d)("q9_topk") == 0.112)
  }

  test("with no driver wrapper at all the newest twin still serves") {
    val d = tempDir()
    write(d, "bench_local_r21.json",
      """{"metric":"total","value":9.0,"unit":"sec","queries":{"q9_topk":0.999},"sf":"/x"}""")
    assert(Bench.prevRoundTimes(d)("q9_topk") == 0.999)
  }
}

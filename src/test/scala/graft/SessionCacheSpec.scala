package graft

import graft.engine.SessionCache

/** Contract of the memo-epoch mechanism the bench's cold-re-run
  * protocol depends on (Bench.scala `ownMemo` handling): inside
  * `freshEpoch` every lookup misses and rebuilds; outside it the
  * original entries keep serving; nesting/exception restore the
  * previous epoch.
  */
class SessionCacheSpec extends SparkSpec {

  test("get memoizes per (session, key); freshEpoch forces a rebuild then restores") {
    val cache = new SessionCache[Int]
    var builds = 0
    def fetch(): Int = cache.get(spark, "k") { builds += 1; builds }

    assert(fetch() == 1 && builds == 1)
    assert(fetch() == 1 && builds == 1, "second get must serve the memo")

    val inEpoch = SessionCache.freshEpoch("t") { fetch() }
    assert(inEpoch == 2 && builds == 2, "freshEpoch lookup must rebuild")

    assert(fetch() == 1 && builds == 2,
      "after freshEpoch the ORIGINAL entry must serve again")
  }

  test("distinct epoch tags do not share entries; epoch survives a throwing body") {
    val cache = new SessionCache[Int]
    var builds = 0
    def fetch(): Int = cache.get(spark, "k") { builds += 1; builds }
    fetch() // builds == 1 under the default epoch

    SessionCache.freshEpoch("a")(fetch())
    SessionCache.freshEpoch("b")(fetch())
    assert(builds == 3, "each epoch tag is its own key space")

    intercept[RuntimeException] {
      SessionCache.freshEpoch("boom") { throw new RuntimeException("x") }
    }
    assert(fetch() == 1 && builds == 3,
      "a throwing freshEpoch body must restore the previous epoch")
  }

  test("reusing one epoch tag serves the first attempt's entry (why Bench tags per attempt)") {
    // The live bug this pins: Bench's cold-billing briefly used ONE
    // tag per query for both timed attempts — the first attempt built
    // the memo under the temp epoch and the second read it back, so
    // min-of-2 recorded a warm memo read (k_sweep billed 0.11 s).
    // Same tag ⇒ shared entry; the protocol must tag per ATTEMPT.
    val cache = new SessionCache[Int]
    var builds = 0
    def fetch(): Int = cache.get(spark, "k") { builds += 1; builds }
    SessionCache.freshEpoch("same")(fetch())
    SessionCache.freshEpoch("same")(fetch())
    assert(builds == 1, "same tag twice shares the entry — NOT a cold re-run")
    SessionCache.freshEpoch("same#2")(fetch())
    assert(builds == 2, "a per-attempt tag forces the honest rebuild")
  }
}

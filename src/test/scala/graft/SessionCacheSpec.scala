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
}

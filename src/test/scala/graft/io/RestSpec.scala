package graft.io

import graft.SparkSpec

class RestSpec extends SparkSpec {

  test("splitDataArray splits flat objects, handles strings with braces") {
    val body = """{"data":[{"a":1,"s":"x{y}"},{"a":2,"s":"q\"u"}]}"""
    val rows = Rest.splitDataArray(body)
    assert(rows == Seq("""{"a":1,"s":"x{y}"}""", """{"a":2,"s":"q\"u"}"""))
  }

  test("splitDataArray on empty data") {
    assert(Rest.splitDataArray("""{"data":[]}""").isEmpty)
  }

  test("secured endpoint rejects missing token and serves with one") {
    val docs = Seq("""{"customer id":1,"name":"n"}""")
    val server = new Rest.FixtureServer(Map("customers" -> docs),
      secured = Set("customers"))
    try {
      assertThrows[Rest.HttpFetchException](
        Rest.extract(server.baseUrl, "customers", None))
      val token = Rest.fetchToken(server.baseUrl, "svc", "secret")
      assert(Rest.extract(server.baseUrl, "customers", Some(token)) == docs)
    } finally server.stop()
  }

  test("unsecured endpoint serves without token") {
    val docs = Seq("""{"supplier id":7}""")
    val server = new Rest.FixtureServer(Map("suppliers" -> docs), Set.empty)
    try assert(Rest.extract(server.baseUrl, "suppliers", None) == docs)
    finally server.stop()
  }

  test("transient 5xx retries to success; exhausted retries propagate") {
    val docs = Seq("""{"id":1}""")
    val flaky = new Rest.FixtureServer(Map("e" -> docs), Set.empty,
      failFirst = 2)
    try {
      assert(Rest.extract(flaky.baseUrl, "e", None) == docs)
      assert(flaky.requestCount("e") == 3) // 2 × 503 + 1 × 200
    } finally flaky.stop()
    val dead = new Rest.FixtureServer(Map("e" -> docs), Set.empty,
      failFirst = 99)
    try {
      val e = intercept[Rest.HttpStatusException](
        Rest.extract(dead.baseUrl, "e", None))
      assert(e.status == 503 && dead.requestCount("e") == 3)
    } finally dead.stop()
  }

  test("4xx never retries: one request for an auth failure") {
    val docs = Seq("""{"id":1}""")
    val server = new Rest.FixtureServer(Map("e" -> docs), secured = Set("e"))
    try {
      intercept[Rest.HttpStatusException](
        Rest.extract(server.baseUrl, "e", None))
      assert(server.requestCount("e") == 1)
    } finally server.stop()
  }

  test("paged extract recovers the one-body feed exactly, page by page") {
    val docs = (0 until 23).map(i => s"""{"id":$i}""")
    val server = new Rest.FixtureServer(Map("things" -> docs), Set.empty)
    try {
      val paged = Rest.extractPaged(server.baseUrl, "things", None,
        pageSize = 5)
      assert(paged == docs) // order-preserving, byte-identical
      // 23 rows at page size 5 → 4 full pages + 1 partial (no extra call:
      // the partial page terminates the loop)
      assert(server.requestCount("things") == 5)
      // exact multiple: the final full page forces one empty-page probe
      val server2count = {
        val s2 = new Rest.FixtureServer(Map("t" -> docs.take(10)), Set.empty)
        try {
          assert(Rest.extractPaged(s2.baseUrl, "t", None, pageSize = 5)
            == docs.take(10))
          s2.requestCount("t")
        } finally s2.stop()
      }
      assert(server2count == 3)
    } finally server.stop()
  }

  test("page iterator is lazy: one HTTP request per next()") {
    // the incremental-landing contract: a consumer that writes page N
    // before pulling page N+1 never holds more than one page — which is
    // only true if the iterator doesn't prefetch
    val docs = (0 until 12).map(i => s"""{"id":$i}""")
    val server = new Rest.FixtureServer(Map("things" -> docs), Set.empty)
    try {
      val pages = Rest.extractPages(server.baseUrl, "things", None,
        pageSize = 5)
      assert(server.requestCount("things") == 0) // constructing fetches nothing
      val p0 = pages.next()
      assert(p0 == docs.take(5) && server.requestCount("things") == 1)
      val p1 = pages.next()
      assert(p1 == docs.slice(5, 10) && server.requestCount("things") == 2)
      val p2 = pages.next()
      assert(p2 == docs.drop(10) && server.requestCount("things") == 3)
      assert(!pages.hasNext) // partial page terminates without a probe
      assert((p0 ++ p1 ++ p2) == docs)
    } finally server.stop()
  }
}

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
}

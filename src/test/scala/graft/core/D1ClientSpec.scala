package graft.core

import org.scalatest.funsuite.AnyFunSuite

class D1ClientSpec extends AnyFunSuite {

  val sampleResponse: String =
    """{"success":true,"errors":[],
      |"result":[{"results":[
      |  {"id":1,"name":"alice","active":true,"note":null},
      |  {"id":2,"name":"bob","active":false,"note":"x"}
      |],"meta":{"changes":0,"last_row_id":0,"rows_read":2,"rows_written":0}}]}""".stripMargin

  test("parseQueryResponse preserves column order and coerces values") {
    val r = D1Client.parseQueryResponse(sampleResponse)
    assert(r.success)
    assert(r.columnOrder == Seq("id", "name", "active", "note"))
    assert(r.rows.size == 2)
    assert(r.rows.head("id") == "1")
    assert(r.rows.head("active") == "1")     // true -> "1"
    assert(r.rows(1)("active") == "0")       // false -> "0"
    assert(r.rows.head("note") == "")        // null -> "" (emitted as NULL)
    assert(r.meta.rowsRead == 2)
  }

  test("parseQueryResponse error path") {
    val r = D1Client.parseQueryResponse(
      """{"success":false,"errors":[{"code":7500,"message":"no such table: x"}],"result":[]}""")
    assert(!r.success)
    assert(r.error == "no such table: x")
  }

  test("config urls") {
    val c = D1Client.Config("acct", "tok", "dbid")
    assert(c.queryUrl ==
      "https://api.cloudflare.com/client/v4/accounts/acct/d1/database/dbid/query")
    assert(c.listDatabasesUrl ==
      "https://api.cloudflare.com/client/v4/accounts/acct/d1/database")
  }

  test("secrets registry with redaction and default probing") {
    Secrets.clear()
    Secrets.register(Secrets.Secret("cloudflare", "d1", "acct1", "tok1"))
    val s = Secrets.resolveD1(None).get
    assert(s.accountId == "acct1")
    assert(!s.toString.contains("tok1"))
    assert(Secrets.lookup("d1", "nope").isEmpty)
    val viaConf = Secrets.lookup("d1", "x",
      k => Map(
        "spark.cloudflare.d1.x.accountId" -> "a2",
        "spark.cloudflare.d1.x.apiToken" -> "t2").get(k))
    assert(viaConf.exists(_.accountId == "a2"))
    Secrets.clear()
  }
}

package graft.sources

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** HTTP source semantics (HttpSource.php:50-74). */
class HttpSourceSpec extends SparkSpec {

  private def withServer(status: Int, body: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/data", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/data")
    finally server.stop(0)
  }

  test("loads JSON array from 200 response") {
    withServer(200, """[{"id": "a", "v": 1}, {"id": "b", "v": 2}]""") { url =>
      val df = HttpSource(url).load(spark)
      assert(df.count() === 2)
      assert(df.columns.toSet === Set("id", "v"))
    }
  }

  test("non-200 status is an error (HttpSource.php:57-60)") {
    withServer(500, "oops") { url =>
      intercept[IllegalStateException] { HttpSource(url).load(spark) }
    }
  }

  test("empty result is an error — mass-deletion guard (HttpSource.php:70-72)") {
    withServer(200, "[]") { url =>
      intercept[IllegalStateException] { HttpSource(url).load(spark) }
    }
  }

  test("setup reports unreachable endpoint (HttpSource.php:35-45)") {
    val r = HttpSource("http://localhost:1/nope").setup(spark)
    assert(!r.ok)
  }
}

package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP query surface over the serving tables — the reference's
  * interactive-query layer re-expressed (SURVEY §2.4):
  *
  *   - `GET /wordcount/{key}`  → `{"{key}": count}` — point lookup
  *     (reference: `services/WordCountService.java:39-41,88-108`)
  *   - `GET /purchases/{key}`  → `{"{key}-{product}": {"count":n,"total":t}, ...}`
  *     — prefix range scan + merge (reference:
  *     `services/PurchasesService.java:58-94,100-123`; the scatter-gather
  *     fan-out and `X-Provenance-Enabled` loop guard disappear because the
  *     driver holds all state — there is no remote peer to loop through)
  *   - `GET /metadata` and `/metadata/{store}` → `{"{host:port}": ["store", ...]}`
  *     (reference: `services/MetadataService.java:31-34,48-60`)
  *
  * Built on the JDK's `com.sun.net.httpserver` — no dependencies. JSON is
  * emitted by a 30-line serializer because the payloads are flat maps of
  * numbers/strings; pulling a JSON library for that would be the tail
  * wagging the dog.
  */
final class HttpApi(serving: Serving, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound address, e.g. "127.0.0.1:43210" (port 0 = ephemeral, for tests). */
  def address: String =
    s"127.0.0.1:${server.getAddress.getPort}"

  // ---- JSON emission (flat values: numbers, strings, maps thereof) ----

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.toSeq.sortBy(_._1.toString)
        .map { case (k, x) => jsonStr(k.toString) + ":" + jsonVal(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(jsonVal).mkString("[", ",", "]")
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case other => jsonStr(other.toString)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def pathKey(ex: HttpExchange, prefix: String): Option[String] = {
    val p = ex.getRequestURI.getPath.stripPrefix(prefix)
    if (p.isEmpty || p.contains("/")) None else Some(p)
  }

  // ---- routes ----

  /** `/wordcount/{key}`: singleton `{key: count}`, 404 when absent —
    * mirrors the reference's `Collections.singletonMap(key, store.get(key))`
    * (`WordCountService.java:101-107`).
    */
  server.createContext("/wordcount/", { ex =>
    val out = for {
      key <- pathKey(ex, "/wordcount/")
      t <- serving.table("wordcount")
      row <- t.get(key)
    } yield Map(key -> row.getOrElse("count", null))
    out match {
      case Some(m) => respond(ex, 200, jsonVal(m))
      case None => respond(ex, 404, "{}")
    }
  })

  /** `/purchases/{customer}`: all `{customer}-{product}` entries via sorted
    * prefix scan — mirrors `store.range(key+"-00000", key+"-99999")`
    * (`PurchasesService.java:113-121`), generalized to a true prefix.
    */
  server.createContext("/purchases/", { ex =>
    val out = for {
      key <- pathKey(ex, "/purchases/")
      t <- serving.table("purchases")
    } yield t.prefix(key + "-").map { case (k, row) => k -> row }.toMap
    out match {
      case Some(m) if m.nonEmpty => respond(ex, 200, jsonVal(m))
      case Some(_) => respond(ex, 404, "{}")
      case None => respond(ex, 404, "{}")
    }
  })

  /** `/metadata` and `/metadata/{store}`: host → store-names map —
    * mirrors `MetadataService.java:48-60`; one host here (the driver).
    */
  server.createContext("/metadata", { ex =>
    pathKey(ex, "/metadata/") match {
      case Some(store) =>
        val names = serving.storeNames.filter(_ == store)
        if (names.isEmpty) respond(ex, 404, "{}")
        else respond(ex, 200, jsonVal(Map(address -> names)))
      case None =>
        respond(ex, 200, jsonVal(Map(address -> serving.storeNames)))
    }
  })

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

package graft.serving

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP query surface over the serving tables — the reference's
  * interactive-query layer re-expressed (SURVEY §2.4):
  *
  *   - `GET /wordcount/{key}`  → `{"{key}": count}` — point lookup
  *     (reference: `services/WordCountService.java:39-41,88-108`)
  *   - `GET /purchases/{key}`  → `{"{key}-{product}": {"count":n,"total":t}, ...}`
  *     — prefix range scan + merge (reference:
  *     `services/PurchasesService.java:58-94,100-123`)
  *   - `GET /metadata` and `/metadata/{store}` → `{"{host:port}": ["store", ...]}`
  *     (reference: `services/MetadataService.java:31-34,48-60`)
  *
  * Single-instance mode (the default) serves everything locally — the
  * driver sees all state. [[shard]] enables the reference's two-instance
  * topology (Q3/Q4, reference `app1/app2.properties`): each instance owns
  * the keys hashing to its index; a point lookup for a foreign key answers
  * **302 redirect** to the owner (`WordCountService.java:47-65`), and a
  * prefix scan **fans out** to every peer and merges, with the
  * `X-Provenance-Enabled` header as the loop guard
  * (`PurchasesService.java:58-94`, guard at `:68`).
  *
  * Built on the JDK's `com.sun.net.httpserver` — no dependencies. JSON is
  * emitted by a small serializer because the payloads are flat maps of
  * numbers/strings; pulling a JSON library for that would be the tail
  * wagging the dog.
  */
final class HttpApi(serving: Serving, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  // Multi-threaded dispatch is load-bearing, not a tuning choice: with the
  // JDK server's default single-threaded executor, two sharded instances
  // scatter-gathering at each other would each block in client.send while
  // the peer's only serving thread is itself blocked — a distributed
  // deadlock. A cached pool (plus the fan-out timeout in fetchEntries)
  // makes that impossible; the reference's Javalin layer is multi-threaded
  // for the same reason.
  private val pool = java.util.concurrent.Executors.newCachedThreadPool()
  server.setExecutor(pool)

  /** (selfIndex, all instance addresses) when sharded; None = single node. */
  @volatile private var routing: Option[(Int, IndexedSeq[String])] = None

  private lazy val client = HttpClient.newHttpClient()

  /** Bound address, e.g. "127.0.0.1:43210" (port 0 = ephemeral, for tests). */
  def address: String =
    s"127.0.0.1:${server.getAddress.getPort}"

  /** Enable sharded routing: this instance is `peers(selfIndex)`. All
    * instances must be configured with the SAME peer list order so
    * [[HttpApi.ownerOf]] agrees everywhere (the reference gets the same
    * agreement from Kafka's partitioner via `queryMetadataForKey`,
    * `WordCountService.java:110-112`).
    */
  def shard(selfIndex: Int, peers: IndexedSeq[String]): this.type = {
    require(selfIndex >= 0 && selfIndex < peers.size, "selfIndex out of range")
    routing = Some((selfIndex, peers)); this
  }

  /** Retrieval configuration: None until [[retrieval]] is called. */
  @volatile private var retrievalConf: Option[HttpApi.Retrieval] = None

  /** Enable the `/search/...` routes over persisted, continuously
    * maintained indexes ([[graft.operators.LexicalIndex]] /
    * [[graft.operators.Similarity.writeIvfIndex]]) — the reference's
    * interactive-query posture (`services/PurchasesService.java:58-94`:
    * query continuously maintained state out-of-band) extended from the
    * point/range serving tables to the retrieval family. Each request
    * runs the library's own indexed query plan (partition-pruned scans),
    * so an index mid-[[graft.operators.LexicalIndex.maintain]] serves
    * its committed epochs.
    */
  def retrieval(conf: HttpApi.Retrieval): this.type = {
    retrievalConf = Some(conf); this
  }

  // ---- JSON emission (flat values: numbers, strings, maps thereof) ----

  // shared with the spill tier's round-trip codec so a spilled entry is
  // byte-identical on the wire to a resident one
  private def jsonStr(s: String): String = ServingJson.str(s)
  private def jsonVal(v: Any): String = ServingJson.value(v)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Path parameter after `prefix`, percent-decoded (the reference's
    * Javalin layer decodes path params the same way).
    */
  /** One percent-decode with PATH semantics: work from the RAW path
    * (`getPath` already percent-decodes, so decoding it again would
    * double-decode "%252B"-style inputs) and shield literal `+` from
    * URLDecoder's form-encoding space rule — in a path, `+` means
    * plus (the `/search/bool/+term` must-operator relies on it).
    */
  private def pathKey(ex: HttpExchange, prefix: String): Option[String] = {
    val p = ex.getRequestURI.getRawPath.stripPrefix(prefix)
    if (p.isEmpty || p.contains("/")) None
    else Some(java.net.URLDecoder.decode(p.replace("+", "%2B"), UTF_8))
  }

  // ---- routes ----

  /** `/wordcount/{key}`: singleton `{key: count}`, 404 when absent —
    * mirrors the reference's `Collections.singletonMap(key, store.get(key))`
    * (`WordCountService.java:101-107`). Sharded: a key owned elsewhere
    * answers 302 with the owner's URL (`WordCountService.java:55-64`).
    */
  server.createContext("/wordcount/", { ex =>
    pathKey(ex, "/wordcount/") match {
      case Some(key) =>
        routing match {
          case Some((self, peers)) if HttpApi.ownerOf(key, peers.size) != self =>
            val owner = peers(HttpApi.ownerOf(key, peers.size))
            // re-encode: `key` is percent-DECODED here, and a raw space/'%'/
            // '?'/non-ASCII char would make the redirect URL invalid
            ex.getResponseHeaders.set("Location",
              s"http://$owner/wordcount/${HttpApi.encodePath(key)}")
            respond(ex, 302, "{}")
          case _ =>
            val out = for {
              t <- serving.table("wordcount")
              row <- t.get(key)
            } yield Map(key -> row.getOrElse("count", null))
            out match {
              case Some(m) => respond(ex, 200, jsonVal(m))
              case None => respond(ex, 404, "{}")
            }
        }
      case None => respond(ex, 404, "{}")
    }
  })

  /** `/purchases/{customer}`: all `{customer}-{product}` entries via sorted
    * prefix scan — mirrors `store.range(key+"-00000", key+"-99999")`
    * (`PurchasesService.java:113-121`), generalized to a true prefix.
    * Sharded: composite keys spread across instances, so the query
    * scatter-gathers — local scan plus an HTTP fan-out to every peer with
    * `X-Provenance-Enabled: true`; a request carrying that header answers
    * from local state only, which is exactly the reference's recursion
    * guard (`PurchasesService.java:68,77-79`).
    */
  server.createContext("/purchases/", { ex =>
    pathKey(ex, "/purchases/") match {
      case Some(key) =>
        val local = serving.table("purchases")
          .map(_.prefix(key + "-").toMap).getOrElse(Map.empty)
        val guarded = ex.getRequestHeaders.containsKey("X-Provenance-Enabled")
        val merged = routing match {
          case Some((self, peers)) if !guarded =>
            val remote = peers.indices.filter(_ != self).flatMap { i =>
              fetchEntries(s"http://${peers(i)}/purchases/${HttpApi.encodePath(key)}")
            }
            local.map { case (k, v) => k -> jsonVal(v) } ++ remote
          case _ => local.map { case (k, v) => k -> jsonVal(v) }
        }
        if (merged.isEmpty) respond(ex, 404, "{}")
        else respond(ex, 200, merged.toSeq.sortBy(_._1)
          .map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}"))
      case None => respond(ex, 404, "{}")
    }
  })

  /** GET a peer's guarded prefix scan; returns (key, rawJsonValue) pairs.
    * Best-effort: an unreachable peer contributes nothing instead of
    * failing the whole merge (its keys reappear once it returns — same
    * availability posture as the reference's per-host okhttp loop). The
    * timeout bounds how long a fan-out can hold this instance's serving
    * thread (HttpTimeoutException is an IOException → treated as
    * unreachable).
    */
  private def fetchEntries(url: String): Seq[(String, String)] =
    try {
      val res = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .timeout(java.time.Duration.ofSeconds(5))
          .header("X-Provenance-Enabled", "true").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() != 200) Nil else HttpApi.parseEntries(res.body())
    } catch { case _: java.io.IOException | _: InterruptedException => Nil }

  /** `/metadata` and `/metadata/{store}`: host → store-names map —
    * mirrors `MetadataService.java:48-60`. Sharded: lists every instance
    * (the reference lists all hosts owning the store).
    */
  server.createContext("/metadata", { ex =>
    val hosts: Seq[String] = routing match {
      case Some((_, peers)) => peers
      case None => Seq(address)
    }
    pathKey(ex, "/metadata/") match {
      case Some(store) =>
        val names = serving.storeNames.filter(_ == store)
        if (names.isEmpty) respond(ex, 404, "{}")
        else respond(ex, 200, jsonVal(hosts.map(_ -> names).toMap))
      case None =>
        respond(ex, 200, jsonVal(hosts.map(_ -> serving.storeNames).toMap))
    }
  })

  // ---- retrieval routes (enabled by [[retrieval]]) ----

  /** `?k=` override, else the configured default. */
  private def kOf(ex: HttpExchange, conf: HttpApi.Retrieval): Int = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").collectFirst { case s if s.startsWith("k=") =>
      s.stripPrefix("k=").toInt }.getOrElse(conf.k)
  }

  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .collectFirst { case s if s.startsWith(name + "=") =>
        java.net.URLDecoder.decode(s.stripPrefix(name + "="), UTF_8) }

  /** Run a retrieval handler with uniform error mapping: a caller error
    * (bad phrase, non-positional index, malformed vector) answers 400
    * with the message — the fail-loud library contract surfaced as a
    * client error, not a 500.
    */
  private def searchRoute(ex: HttpExchange)(
      body: HttpApi.Retrieval => String): Unit =
    retrievalConf match {
      case None => respond(ex, 404,
        """{"error":"retrieval not configured"}""")
      case Some(conf) =>
        // per-request scheduler pool (thread-scoped, so each concurrent
        // handler gets its own): with `spark.scheduler.mode=FAIR` on
        // the serving context, two concurrent heavy searches SHARE
        // executor slots fairly instead of the second's stages queueing
        // behind every stage of the first (FIFO gives the head job all
        // the slots it asks for). Under the default FIFO mode the
        // property is inert — correctness never depends on it. The
        // cached-pool dispatch above prevents the deadlock half;
        // this is the throughput half.
        // Pool names are bounded (mod 32): Spark's root pool retains
        // every pool name it has ever seen, and a long-lived server
        // with a cached thread pool mints unbounded thread ids — a
        // fixed 32-name space keeps fairness without that slow leak.
        val sc = conf.spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool",
          "graft-search-" + (Thread.currentThread().getId % 32))
        try respond(ex, 200, body(conf))
        catch {
          case e @ (_: IllegalArgumentException | _: IllegalStateException |
              _: NumberFormatException) =>
            respond(ex, 400, "{\"error\":" + jsonStr(
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName)) + "}")
        } finally sc.setLocalProperty("spark.scheduler.pool", null)
    }

  /** The one-row (query_id = 0) query frame of a single HTTP search. */
  private def oneQuery(conf: HttpApi.Retrieval,
      cols: (String, org.apache.spark.sql.Column)*)
      : org.apache.spark.sql.DataFrame =
    conf.spark.range(1).select(cols.map { case (n, c) => c.as(n) }: _*)

  /** `/search/bm25/{terms}`: whitespace-separated terms → top-k doc ids
    * from the maintained lexical index, `[{"rank":1,"doc_id":42},...]`.
    */
  server.createContext("/search/bm25/", { ex =>
    searchRoute(ex) { conf =>
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val terms = pathKey(ex, "/search/bm25/")
        .map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException("no query terms"))
      val q = oneQuery(conf,
        "query_id" -> org.apache.spark.sql.functions.lit(0L),
        "qterms" -> org.apache.spark.sql.functions.typedlit(terms))
      graft.operators.LexicalIndex
        .bm25TopKIndexed(conf.spark, path, q, "query_id", "qterms",
          kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/phrase/{phrase}`: quoted-phrase retrieval from a
    * POSITIONAL lexical index,
    * `[{"rank":1,"doc_id":4,"n_hits":3},...]`; 400 on a
    * non-positional index (the library's fail-loud contract).
    */
  server.createContext("/search/phrase/", { ex =>
    searchRoute(ex) { conf =>
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val phrase = pathKey(ex, "/search/phrase/").getOrElse(
        throw new IllegalArgumentException("no phrase"))
      val q = oneQuery(conf,
        "query_id" -> org.apache.spark.sql.functions.lit(0L),
        "phrase" -> org.apache.spark.sql.functions.lit(phrase))
      graft.operators.LexicalIndex
        .phraseTopKIndexed(conf.spark, path, q, "query_id", "phrase",
          kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")},"n_hits":${r.getAs[Long]("n_hits")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/near/{terms}?slop=N`: proximity retrieval from a
    * POSITIONAL lexical index — docs holding every term within a word
    * window of `slop` (default 8), tightest-first,
    * `[{"rank":1,"doc_id":4,"span":2},...]`; 400 on a non-positional
    * index or a malformed slop (the library's fail-loud contract).
    */
  server.createContext("/search/near/", { ex =>
    searchRoute(ex) { conf =>
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val terms = pathKey(ex, "/search/near/").getOrElse(
        throw new IllegalArgumentException("no query terms"))
      val slop = queryParam(ex, "slop").map(_.toInt).getOrElse(8)
      val q = oneQuery(conf,
        "query_id" -> org.apache.spark.sql.functions.lit(0L),
        "qterms" -> org.apache.spark.sql.functions.lit(terms))
      graft.operators.LexicalIndex
        .proximityTopKIndexed(conf.spark, path, q, "query_id", "qterms",
          slop, kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")},"span":${r.getAs[Long]("span")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/passage/{terms}?window=N`: windowed-passage retrieval
    * from a POSITIONAL lexical index — docs ranked by their
    * query-term-densest `window`-word span (default 8), winning start
    * returned, `[{"rank":1,"doc_id":4,"n_hits":3,"start":12},...]`;
    * with a configured corpus (`docsPath`) each row also carries the
    * sliced passage TEXT (`"snippet":"..."` — the retrieve-then-quote
    * payload), served by [[graft.operators.LexicalIndex
    * .passageSnippetsIndexed]] with the corpus scan bounded to the k
    * winning ids; `?highlight=1` wraps matched terms in `[...]` —
    * pure presentation on the k collected rows, so it runs
    * driver-side, not in the plan. 400 on a non-positional index or
    * malformed window.
    */
  server.createContext("/search/passage/", { ex =>
    searchRoute(ex) { conf =>
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val terms = pathKey(ex, "/search/passage/").getOrElse(
        throw new IllegalArgumentException("no query terms"))
      val window = queryParam(ex, "window").map(_.toInt).getOrElse(8)
      val q = oneQuery(conf,
        "query_id" -> org.apache.spark.sql.functions.lit(0L),
        "qterms" -> org.apache.spark.sql.functions.lit(terms))
      val k = kOf(ex, conf)
      val highlight = queryParam(ex, "highlight").exists(v =>
        v == "1" || v == "true")
      // snippets hold NORMALIZED tokens, so matching is exact
      // whole-token equality against the normalized query terms
      val qset = terms.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
      def mark(s: String): String =
        if (!highlight) s
        else s.split(" ").map(w =>
          if (qset.contains(w)) s"[$w]" else w).mkString(" ")
      conf.docsPath match {
        case Some(docs) =>
          graft.operators.LexicalIndex
            .passageSnippetsIndexed(conf.spark, path,
              conf.spark.read.parquet(docs), conf.docIdCol,
              conf.docTextCol, q, "query_id", "qterms", window, k)
            .orderBy("rank").collect()
            .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
              r.getAs[Long]("doc_id")},"n_hits":${r.getAs[Long]("n_hits")
              },"start":${r.getAs[Long]("start")},"snippet":${
              jsonStr(mark(r.getAs[String]("snippet")))}}""")
            .mkString("[", ",", "]")
        case None =>
          graft.operators.LexicalIndex
            .passageTopKIndexed(conf.spark, path, q, "query_id", "qterms",
              window, k)
            .orderBy("rank").collect()
            .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
              r.getAs[Long]("doc_id")},"n_hits":${r.getAs[Long]("n_hits")
              },"start":${r.getAs[Long]("start")}}""")
            .mkString("[", ",", "]")
      }
    }
  })

  /** `/search/index`: operational snapshot of the configured lexical
    * index ([[graft.operators.LexicalIndex.describe]]) — layout knobs,
    * generation ids, folded-batch count, corpus totals and the parquet
    * file count (the compaction-pressure signal). The retrieval
    * family's analog of `/metadata`.
    */
  server.createContext("/search/index", { ex =>
    searchRoute(ex) { conf =>
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val i = graft.operators.LexicalIndex.describe(conf.spark, path)
      s"""{"n_buckets":${i.nBuckets},"positional":${i.positional},""" +
        s""""posting_generations":${i.postingGenerations
          .map(jsonStr).mkString("[", ",", "]")},""" +
        s""""stats_generations":${i.statsGenerations
          .map(jsonStr).mkString("[", ",", "]")},""" +
        s""""folded_batches":${i.foldedBatches},"n_docs":${i.nDocs},""" +
        s""""total_len":${i.totalLen},"parquet_files":${i.parquetFiles}}"""
    }
  })

  /** `/search/bool/{expr}`: boolean-filtered BM25 — `+term` is
    * required in every hit, `-term` disqualifies, bare terms score
    * (`fast +table -zebra`). Candidates satisfying the gates rank by
    * the standard BM25 score over their matched scoring terms.
    * `[{"rank":1,"doc_id":42},...]`; an all-negative expression
    * answers 400 (nothing to rank).
    */
  server.createContext("/search/bool/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.{lit, typedlit}
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val raw = pathKey(ex, "/search/bool/")
        .map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException("no query terms"))
      val must = raw.filter(_.startsWith("+")).map(_.drop(1))
        .filter(_.nonEmpty)
      val mustNot = raw.filter(_.startsWith("-")).map(_.drop(1))
        .filter(_.nonEmpty)
      val should = raw.filterNot(t =>
        t.startsWith("+") || t.startsWith("-"))
      val q = oneQuery(conf, "query_id" -> lit(0L),
        "must" -> typedlit(must), "should" -> typedlit(should),
        "mustNot" -> typedlit(mustNot))
      graft.operators.LexicalIndex
        .bm25TopKBoolIndexed(conf.spark, path, q, "query_id", "must",
          "should", "mustNot", kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/fuzzy/{terms}?dist=N`: typo-tolerant BM25 from the
    * lexical index — each term expands to the vocabulary terms within
    * Levenshtein `dist` (default 1) via the SymSpell deletion-variant
    * join, then ranks through the one BM25 path.
    * `[{"rank":1,"doc_id":42},...]`; a query whose terms expand to
    * nothing answers `[]`.
    */
  server.createContext("/search/fuzzy/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.{lit, typedlit}
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val terms = pathKey(ex, "/search/fuzzy/")
        .map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException("no query terms"))
      val dist = queryParam(ex, "dist").map(_.toInt).getOrElse(1)
      val q = oneQuery(conf, "query_id" -> lit(0L),
        "qterms" -> typedlit(terms))
      graft.operators.LexicalIndex
        .bm25TopKFuzzyIndexed(conf.spark, path, q, "query_id", "qterms",
          kOf(ex, conf), maxDist = dist)
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/mlt/{docId}?m=N`: more-like-this — the k docs most
    * similar to the given corpus document, ranked by BM25 over its own
    * top-`m` (default 3) tf-idf terms; the seed itself is excluded.
    * Seed text comes from the corpus table (`docsPath` — 400 when
    * absent), keyword idf and the ranking from the maintained index.
    * `[{"rank":1,"doc_id":42},...]`; an unknown docId answers `[]`.
    */
  server.createContext("/search/mlt/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.lit
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val docs = conf.docsPath.getOrElse(
        throw new IllegalStateException(
          "no corpus table configured (Retrieval.docsPath) - " +
            "more-like-this reads the seed's text from the corpus"))
      val seedId = pathKey(ex, "/search/mlt/")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(throw new IllegalArgumentException(
          "more-like-this needs a numeric doc id"))
      val m = queryParam(ex, "m").map(_.toInt).getOrElse(3)
      graft.operators.LexicalIndex.moreLikeThisIndexed(conf.spark, path,
          conf.spark.read.parquet(docs), conf.docIdCol, conf.docTextCol,
          oneQuery(conf, "doc_id" -> lit(seedId)), "doc_id",
          mTerms = m, k = kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/significant/{terms}`: the match set's over-represented
    * vocabulary ([[graft.operators.LexicalIndex
    * .significantTermsIndexed]] — log df-lift vs the corpus, the
    * query's own terms excluded), the mined facet panel beside
    * `/search/facets`. `[{"rank":1,"term":"...","score":1.234567},...]`.
    */
  server.createContext("/search/significant/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.lit
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val terms = pathKey(ex, "/search/significant/").getOrElse(
        throw new IllegalArgumentException("no query terms"))
      val q = oneQuery(conf, "query_id" -> lit(0L),
        "qterms" -> lit(terms))
      graft.operators.LexicalIndex
        .significantTermsIndexed(conf.spark, path, q, "query_id",
          "qterms", kOf(ex, conf))
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"term":${
          jsonStr(r.getAs[String]("term"))},"score":${
          r.getAs[Double]("score")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/facets/{terms}`: the search-facet panel — how the docs
    * matching ANY query term distribute over the corpus's configured
    * facet column (`Retrieval.facetCol`), biggest slice first (facet
    * string as tiebreak). Match set from the maintained index, facet
    * attribute from the corpus table (`docsPath` — 400 when absent).
    * `[{"facet":"en","n_docs":3},...]`; an unlabeled (null-facet)
    * slice renders `"facet":null`.
    */
  server.createContext("/search/facets/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.lit
      val path = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val docs = conf.docsPath.getOrElse(
        throw new IllegalStateException(
          "no corpus table configured (Retrieval.docsPath) - facets " +
            "join per-doc attributes from the corpus"))
      val terms = pathKey(ex, "/search/facets/").getOrElse(
        throw new IllegalArgumentException("no query terms"))
      val q = oneQuery(conf, "query_id" -> lit(0L),
        "qterms" -> lit(terms))
      graft.operators.LexicalIndex
        .facetCountsIndexed(conf.spark, path, q, "query_id", "qterms",
          conf.spark.read.parquet(docs), conf.docIdCol, conf.facetCol)
        .orderBy(org.apache.spark.sql.functions.col("n_docs").desc,
          org.apache.spark.sql.functions.col("facet"))
        .collect()
        .map(r => s"""{"facet":${Option(r.getAs[Any]("facet"))
          .map(f => jsonStr(f.toString)).getOrElse("null")},"n_docs":${
          r.getAs[Long]("n_docs")}}""")
        .mkString("[", ",", "]")
    }
  })

  /** `/search/hybrid/{terms}?vec=0.1,0.2,...`: reciprocal-rank fusion
    * ([[graft.operators.RankFusion.rrf]] — the q137 math, single-homed)
    * of the lexical BM25 list with the dense
    * [[graft.operators.Similarity.ivfTopKIndexed]] list over the
    * configured ANN index; the caller supplies the query embedding (the
    * encoder lives outside the engine). `[{"rank":1,"doc_id":42},...]`.
    */
  server.createContext("/search/hybrid/", { ex =>
    searchRoute(ex) { conf =>
      import org.apache.spark.sql.functions.{lit, typedlit}
      val lexPath = conf.lexicalIndexPath.getOrElse(
        throw new IllegalStateException("no lexical index configured"))
      val annPath = conf.annIndexPath.getOrElse(
        throw new IllegalStateException("no ANN index configured"))
      val terms = pathKey(ex, "/search/hybrid/")
        .map(_.split("\\s+").filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException("no query terms"))
      val qv = queryParam(ex, "vec")
        .map(_.split(",").map(_.trim.toDouble))
        .getOrElse(throw new IllegalArgumentException(
          "hybrid search needs ?vec=<comma-separated query embedding>"))
      val k = kOf(ex, conf)
      val lex = graft.operators.LexicalIndex.bm25TopKIndexed(conf.spark,
        lexPath,
        oneQuery(conf, "query_id" -> lit(0L), "qterms" -> typedlit(terms)),
        "query_id", "qterms", k)
      // the dense list is ordered (sim desc, id asc); rebuild the
      // (query_id, rank, doc_id) shape rrf expects from its k rows
      val dense = graft.operators.Similarity.ivfTopKIndexed(conf.spark,
          annPath, conf.annIdCol, conf.annEmbCol, qv, queryId = -1L, k)
        .collect().zipWithIndex
        // read the id defensively: a non-integral annIdCol must surface
        // as the route's 400 (searchRoute maps IllegalArgumentException),
        // not as a ClassCastException-driven 500 on every request
        .map { case (r, i) =>
          val id = r.get(0) match {
            case n: java.lang.Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"ANN id column '${conf.annIdCol}' must be integral; " +
                s"index holds ${if (other == null) "null"
                  else other.getClass.getSimpleName}")
          }
          (0L, (i + 1).toLong, id)
        }
      import conf.spark.implicits._
      val denseDf = dense.toSeq.toDF("query_id", "rank", "doc_id")
      graft.operators.RankFusion
        .rrf(Seq(lex.select("query_id", "rank", "doc_id"), denseDf),
          "doc_id", k)
        .orderBy("rank").collect()
        .map(r => s"""{"rank":${r.getAs[Long]("rank")},"doc_id":${
          r.getAs[Long]("doc_id")}}""")
        .mkString("[", ",", "]")
    }
  })

  def start(): this.type = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object HttpApi {

  /** Configuration of the `/search/...` retrieval routes: the persisted
    * index paths the instance serves (either may be absent — a route
    * whose index is unconfigured answers 400) and the ANN index's id /
    * embedding column names. `k` is the default result count
    * (`?k=` overrides per request).
    */
  /** `docsPath` points the serving edge at the corpus parquet (id +
    * text + facet columns): `/search/passage` then attaches snippet
    * TEXT (the retrieve-then-quote payload a RAG caller wants) and
    * `/search/facets` serves the panel — both slice the corpus with a
    * k-bounded or column-pruned scan, never a full read. Routes that
    * need it answer 400 when it is absent.
    */
  final case class Retrieval(
      spark: org.apache.spark.sql.SparkSession,
      lexicalIndexPath: Option[String] = None,
      annIndexPath: Option[String] = None,
      annIdCol: String = "vec_id",
      annEmbCol: String = "embedding",
      k: Int = 5,
      docsPath: Option[String] = None,
      docIdCol: String = "doc_id",
      docTextCol: String = "text",
      facetCol: String = "lang")

  /** Percent-encode one path segment (URLEncoder is form-encoding; its '+'
    * for space is wrong in a path).
    */
  def encodePath(segment: String): String =
    java.net.URLEncoder.encode(segment, UTF_8).replace("+", "%20")

  /** Deterministic key → instance index; every instance must agree.
    * (Reference analog: the store serializer's partition hash,
    * `WordCountService.java:110-112`.)
    */
  def ownerOf(key: String, nInstances: Int): Int = {
    var h = 0
    var i = 0
    while (i < key.length) { h = 31 * h + key.charAt(i); i += 1 }
    java.lang.Math.floorMod(h, nInstances)
  }

  /** Split a flat one-level JSON object body `{"k":v,...}` into
    * (key, rawValue) pairs — values may themselves be objects (depth-aware
    * split on top-level commas). Sufficient for the serving payloads; not a
    * general JSON parser.
    */
  def parseEntries(body: String): Seq[(String, String)] = {
    val inner = body.trim.stripPrefix("{").stripSuffix("}").trim
    if (inner.isEmpty) return Nil
    val parts = Vector.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = 0
    for (i <- inner.indices) {
      val c = inner.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 => parts += inner.substring(start, i); start = i + 1
        case _ =>
      }
    }
    parts += inner.substring(start)
    parts.result().map { kv =>
      val idx = kv.indexOf(':')
      val rawKey = kv.substring(0, idx).trim
      (rawKey.stripPrefix("\"").stripSuffix("\""), kv.substring(idx + 1).trim)
    }
  }
}

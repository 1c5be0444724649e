package graft.client

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A faulty, idempotency-key-aware mock CMS: every list endpoint serves
  * JSON-lines; every mutation endpoint fails the FIRST delivery of each
  * idempotency key with a 503 (forcing the client's retry path) and
  * deduplicates replays by key — the contract a real idempotent REST API
  * provides.
  */
class HttpGatherClientSpec extends SparkSpec {

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  test("HTTP client: lists parse, flaky POSTs retry, replays dedupe by key") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val applied = new ConcurrentHashMap[String, String]() // key -> batch
    val attempts = new AtomicInteger(0)
    val failedOnce = ConcurrentHashMap.newKeySet[String]()
    server.createContext("/projects/archived", (ex: HttpExchange) =>
      respond(ex, 200, ""))
    server.createContext("/projects", (ex: HttpExchange) =>
      if (ex.getRequestURI.getPath == "/projects") respond(ex, 200,
        """{"id": 1, "iam": "gatherbot", "p_file": "a/b.shp", "p_md5": "m1", "title": "t1", "is_dataset": true}
          |{"id": 2, "iam": "gatherbot", "p_file": "c/d.shp", "p_md5": "m2", "title": "t2", "is_dataset": false}"""
          .stripMargin)
      else { // mutation endpoints: fail first delivery per key, dedupe replays
        attempts.incrementAndGet()
        val key = ex.getRequestHeaders.getFirst("Idempotency-Key")
        if (failedOnce.add(key)) respond(ex, 503, "try again")
        else { applied.putIfAbsent(key, body(ex)); respond(ex, 200, "ok") }
      })
    server.createContext("/categories", (ex: HttpExchange) =>
      respond(ex, 200, ""))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new HttpGatherClient(spark, base)

      // list endpoints: rows parse into the nested API shape; empty lists
      // still come back typed
      val projs = client.listProjects().orderBy("id").collect()
      assert(projs.length == 2)
      assert(projs.head.getStruct(1).getStruct(1).getString(0) == "a/b.shp")
      assert(client.listArchivedProjects().count() == 0)
      assert(client.listCategories().count() == 0)

      // a 3-partition action table -> 3 batches, each 503s once and then
      // lands exactly once under its idempotency key
      import spark.implicits._
      // hash-partitioned on ord + sorted within partitions: batch contents
      // and row order are deterministic, so a replay reproduces the same
      // idempotency keys (shuffle fetch order otherwise varies run to run)
      val creates = (1 to 30).map(i => (i.toLong, s"f$i.shp", s"md5_$i"))
        .toDF("ord", "file", "md5")
        .repartition(3, $"ord").sortWithinPartitions("ord")
      client.applyCreates(creates)
      assert(applied.size() == 3, s"expected 3 deduped batches, got $applied")
      val allRows = applied.values().toArray.mkString
      (1 to 30).foreach(i => assert(allRows.contains(s"md5_$i")))
      // every batch was delivered at least twice (the forced 503 + retry)
      assert(attempts.get() >= 6)

      // replaying the SAME action table is a server-side no-op (same keys)
      client.applyCreates(creates)
      assert(applied.size() == 3)
    } finally server.stop(0)
  }

  test("whole production path: scan -> sync -> REST apply") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-http-e2e")
    Files.createDirectories(root.resolve("Ward"))
    Files.write(root.resolve("Ward/area.shp"), "shape-a".getBytes("UTF-8"))
    Files.write(root.resolve("Ward/zone.shp"), "shape-z".getBytes("UTF-8"))

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val posts = new ConcurrentHashMap[String, String]() // path -> concat bodies
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (ex.getRequestMethod == "GET") respond(ex, 200, "") // empty remote
      else { posts.merge(path, body(ex), _ + _); respond(ex, 200, "ok") }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new HttpGatherClient(spark, base)
      val sync = new graft.DataWarehouseSync(spark,
        graft.GraftConfig(path = root.toString), client)
      val r = sync.syncFilesystem()
      assert(r.creates.count() == 2)
      // both scanned files were POSTed as creates; nothing updated/archived
      val created = posts.getOrDefault("/projects/create", "")
      assert(created.contains("Ward/area.shp") && created.contains("Ward/zone.shp"))
      assert(!posts.containsKey("/projects/update") ||
        posts.get("/projects/update") == "")
      assert(!posts.containsKey("/projects/archive") ||
        posts.get("/projects/archive") == "")
    } finally server.stop(0)
  }
}

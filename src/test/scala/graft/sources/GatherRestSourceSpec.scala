package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.v2.GatherSource
import graft.sync.SyncInputs

/** S6 as a DataSourceV2 source: pushdown reaching the wire, paged
  * partitioned reads, the file transport used by the oracled entries, and
  * plan-level assertions (scan_remote_pushdown).
  */
class GatherRestSourceSpec extends SparkSpec {

  private val wireLines =
    """{"id": 1, "iam": "gatherbot", "p_file": "a/b.shp", "p_md5": "m1", "title": "t1", "is_dataset": true}
      |{"id": 2, "iam": "gatherbot", "p_file": "c/d.shp", "p_md5": "m2", "title": "t2", "is_dataset": false}
      |{"id": 3, "iam": "human", "p_file": "e/f.shp", "p_md5": "m3", "title": "t3", "is_dataset": true}
      |{"id": 4, "iam": "gatherbot", "p_file": "g/h.shp", "p_md5": null, "title": "t4", "is_dataset": true}"""
      .stripMargin

  private def withServer(test: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new ConcurrentLinkedQueue[String]()
    server.createContext("/projects", (ex: HttpExchange) => {
      // RAW query: percent-escapes preserved, so tests can distinguish an
      // encoded comma inside a value (%2C) from a raw separator comma
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      requests.add(q)
      // server-side paging: shard lines by part/parts when asked (the
      // cooperating-server case; pruning/limit params are ignored here,
      // which the reader must tolerate)
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val part = params.getOrElse("part", "0").toInt
      val parts = params.getOrElse("parts", "1").toInt
      val mine = wireLines.split("\n").zipWithIndex
        .collect { case (l, i) if i % parts == part => l }
      val b = mine.mkString("\n").getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/projects", requests)
    finally server.stop(0)
  }

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("http transport: full scan, typed nulls, short-name registration") {
    withServer { (url, _) =>
      // registered short name resolves through META-INF/services
      val df = spark.read.format("gather")
        .schema(GatherSource.ProjectsSchema).option("url", url).load()
      val rows = df.orderBy("id").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rows(3).isNullAt(3)) // p_md5 null survives typed
    }
  }

  test("scan_remote_pushdown: pruning, limit and filters reach the wire and the plan") {
    withServer { (url, requests) =>
      val base = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema).option("url", url).load()

      // column pruning + limit pushdown
      val pruned = base.select("id", "title").limit(2)
      val desc = scanDescription(pruned)
      assert(desc.contains("PushedLimit: 2"), s"plan missing pushed limit:\n$desc")
      assert(desc.contains("ReadSchema: struct<id:bigint,title:string>"),
        s"plan missing pruned schema:\n$desc")
      assert(pruned.collect().length == 2)
      val lastQ = requests.asScala.toSeq.last
      assert(lastQ.contains("fields=id%2Ctitle") || lastQ.contains("fields=id,title"),
        s"pruning did not reach the wire: $lastQ")
      assert(lastQ.contains("limit=2"), s"limit did not reach the wire: $lastQ")

      // EqualTo + IsNotNull push into the source; results still correct
      val filtered = base.filter(col("iam") === "gatherbot" && col("p_md5").isNotNull)
        .select("id")
      val fdesc = scanDescription(filtered)
      assert(fdesc.contains("EqualTo(iam,gatherbot)"), s"filter not pushed:\n$fdesc")
      assert(fdesc.contains("IsNotNull(p_md5)"), s"isnotnull not pushed:\n$fdesc")
      assert(filtered.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      val fq = requests.asScala.toSeq.last
      assert(fq.contains("f_iam=gatherbot"), s"filter did not reach the wire: $fq")

      // IN pushes as one filter (typed long membership), reaches the wire
      // as the advisory in_ param, and the reader re-applies it exactly
      val inF = base.filter(col("id").isin(1L, 3L, 99L)).select("id")
      val idesc = scanDescription(inF)
      assert(idesc.contains("In(id"), s"IN not pushed:\n$idesc")
      assert(inF.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      val iq = requests.asScala.toSeq.last
      assert(iq.contains("in_id="), s"IN did not reach the wire: $iq")

      // a value containing a comma must stay one value on the wire:
      // per-value encoding (%2C inside values, raw ',' as separator)
      base.filter(col("title").isin("a,b", "c")).select("id").collect()
      val cq = requests.asScala.toSeq.last
      assert(cq.contains("in_title=a%2Cb,c"),
        s"embedded comma must encode as %2C, separators stay raw: $cq")

      // a limit above a pushed aggregate must NOT reach the wire — a
      // cooperating server would truncate the body before aggregating
      val aggLim = base.agg(min("id").as("mn"), max("id").as("mx")).limit(1)
      val adesc = scanDescription(aggLim)
      assert(adesc.contains("PushedAggregates: [min(id), max(id)]"),
        s"aggregate should still push:\n$adesc")
      assert(adesc.contains("PushedLimit: none"),
        s"limit must be refused once an aggregate is pushed:\n$adesc")
      assert(aggLim.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 4L)))
    }
  }

  test("paged partitioned read: parts=N plans N partitions, union is exact") {
    withServer { (url, requests) =>
      val df = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", url).option("parts", "3")
        .option("serverPaging", "true").load()
      assert(df.rdd.getNumPartitions == 3)
      requests.clear()
      assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      val pages = requests.asScala.toSeq
      assert(pages.count(_.contains("parts=3")) == 3,
        s"expected 3 paged requests, got: $pages")
      assert((0 until 3).forall(i => pages.exists(_.contains(s"part=$i"))))
    }
  }

  test("parts>1 against a non-paging server stripes instead of duplicating") {
    withServer { (url, _) =>
      // without serverPaging the reader must not trust the server to
      // shard: each partition takes a disjoint stripe of the full body
      val df = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", url).option("parts", "3").load()
      assert(df.rdd.getNumPartitions == 3)
      assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L), "rows must appear exactly once")
    }
  }

  test("a fields=-honoring server still satisfies pushed filters") {
    // serves ONLY the requested fields — the filter columns must have
    // been included in fields= or every row would read null and vanish
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/projects", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val fields = q.split("&").find(_.startsWith("fields="))
        .map(_.drop(7).split("%2C|,").toSet)
        .getOrElse(Set("id", "iam", "p_file", "p_md5", "title", "is_dataset"))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val trimmed = wireLines.split("\n").map { l =>
        val node = mapper.readTree(l)
        val kept = node.fields().asScala.filter(e => fields.contains(e.getKey))
          .map(e => "\"" + e.getKey + "\": " + e.getValue.toString)
        kept.mkString("{", ", ", "}")
      }
      val b = trimmed.mkString("\n").getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val df = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}/projects")
        .load()
        .filter(col("iam") === "gatherbot" && col("is_dataset"))
        .select("id")
      assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    } finally server.stop(0)
  }

  test("error paths: 404 fails the task without retrying; 503 retries then succeeds") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val attempts404 = new java.util.concurrent.atomic.AtomicInteger(0)
    val attempts503 = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/missing", (ex: HttpExchange) => {
      attempts404.incrementAndGet()
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      // first two deliveries 503, then a valid body
      if (attempts503.incrementAndGet() <= 2) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val b = """{"id": 1, "iam": "gatherbot", "p_file": "a.shp", "p_md5": "m", "title": "t", "is_dataset": true}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val bad = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", s"$base/missing").load()
      val e = intercept[org.apache.spark.SparkException](bad.collect())
      assert(e.getMessage.contains("404") ||
        Option(e.getCause).exists(_.getMessage.contains("404")))
      assert(attempts404.get() == 1,
        s"permanent 404 must not burn the retry budget: ${attempts404.get()} attempts")

      val flaky = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", s"$base/flaky").load()
      assert(flaky.collect().map(_.getLong(0)).toSeq == Seq(1L))
      assert(attempts503.get() == 3)
    } finally server.stop(0)
  }

  test("token option attaches Authorization: Bearer on scan GETs and write POSTs") {
    // mirrors the reference's credentialed client construction
    // (index.js:1,9 — GatherClient(credentials, ...)): the V2 `token`
    // option must reach the wire from EXECUTOR-side requests on both
    // transports, and stay absent when unconfigured.
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val auths = new ConcurrentLinkedQueue[String]()
    def recordAuth(ex: HttpExchange): Unit =
      auths.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("<none>"))
    server.createContext("/projects", (ex: HttpExchange) => {
      recordAuth(ex)
      val b = wireLines.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.createContext("/projects/create", (ex: HttpExchange) => {
      recordAuth(ex)
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // scan with a token: every GET carries the bearer header
      val n = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", s"$base/projects").option("token", "sekrit-123")
        .load().count()
      assert(n == 4)
      // write with a token: every POST batch carries it too
      import spark.implicits._
      val actions = Seq((1L, "a.shp"), (2L, "b.shp")).toDF("id", "file")
        .repartition(2)
      graft.sink.Actions.applyV2(actions, s"$base/projects/create",
        token = Some("sekrit-123"))
      val seen = auths.asScala.toSeq
      assert(seen.nonEmpty && seen.forall(_ == "Bearer sekrit-123"),
        s"expected Bearer on every request, saw: $seen")
      // unconfigured: no Authorization header leaks
      auths.clear()
      spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", s"$base/projects").load().count()
      assert(auths.asScala.forall(_ == "<none>"),
        s"tokenless scan must not send Authorization: ${auths.asScala.toSeq}")
    } finally server.stop(0)
  }

  test("aggregate pushdown: count/min/max compute in the scan, limit refuses it") {
    withServer { (url, _) =>
      val base = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema).option("url", url)
        .option("parts", "3").load()
      val agged = base.filter(col("iam") === "gatherbot")
        .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"),
          count(col("p_md5")).as("n_md5"))
      val desc = scanDescription(agged)
      assert(desc.contains("PushedAggregates: [count_star, min(id), max(id), count(p_md5)]"),
        s"aggregates not pushed:\n$desc")
      val r = agged.head()
      // rows 1,2,4 are gatherbot; row 4 has null p_md5 (COUNT skips it)
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((3L, 1L, 4L, 2L)))

      // a pushed limit truncates the body pre-aggregation — the builder
      // must refuse the combination and let Spark aggregate post-scan
      val limited = base.limit(2).agg(count(lit(1)).as("n"))
      val ldesc = scanDescription(limited)
      assert(ldesc.contains("PushedAggregates: []"),
        s"aggregate must not ride on a pushed limit:\n$ldesc")
      assert(limited.head().getLong(0) == 2L)

      // single-partition scans claim complete pushdown; result identical
      val one = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema).option("url", url).load()
        .agg(min("p_file").as("lo_file"))
      assert(scanDescription(one).contains("PushedAggregates: [min(p_file)]"))
      assert(one.head().getString(0) == "a/b.shp")
    }
  }

  test("micro-batch poll stream: one AvailableNow poll equals the batch scan") {
    withServer { (url, requests) =>
      val stream = spark.readStream.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema).option("url", url).load()
      assert(stream.isStreaming)
      val q = stream.writeStream.format("memory").queryName("gather_poll_spec")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000L), "poll stream did not stop")
      val streamed = spark.table("gather_poll_spec")
        .orderBy("id").collect().map(_.toString).toSeq
      spark.catalog.dropTempView("gather_poll_spec")
      val batch = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema).option("url", url).load()
        .orderBy("id").collect().map(_.toString).toSeq
      assert(streamed == batch, "a poll snapshot must equal the batch scan")
    }
  }

  test("poll stream offsets: admission advances, equal offsets plan nothing") {
    val props = new java.util.HashMap[String, String]()
    props.put("url", SyncInputs.projectsWireUrl(spark, sf001))
    props.put("parts", "2")
    val table = new graft.sources.v2.GatherSource()
      .getTable(GatherSource.ProjectsSchema, Array.empty, props)
    val s = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(props))
      .build().toMicroBatchStream("unused")
    val o0 = s.initialOffset()
    val o1 = s.latestOffset()
    val o2 = s.latestOffset()
    assert(o0.json().toLong < o1.json().toLong &&
      o1.json().toLong < o2.json().toLong, "each trigger admits a new poll")
    assert(s.planInputPartitions(o1, o1).isEmpty,
      "no elapsed poll -> no partitions")
    // several elapsed polls still read ONE current snapshot (idempotent
    // re-lists collapse, like the daemon skipping cycles while busy)
    assert(s.planInputPartitions(o0, o2).length == 2)
    // restart resync: deserializing a checkpointed offset moves admission
    // past it
    s.deserializeOffset("100")
    assert(s.latestOffset().json().toLong > 100L)
  }

  test("file transport: landed-list scan matches the in-memory derivation") {
    val viaV2 = spark.read.format(GatherSource.Format)
      .schema(GatherSource.ProjectsSchema)
      .option("url", SyncInputs.projectsWireUrl(spark, sf001))
      .option("parts", "4").load()
    val direct = SyncInputs.projects(spark, sf001)
    assert(viaV2.count() == direct.count())
    assert(viaV2.exceptAll(direct).isEmpty && direct.exceptAll(viaV2).isEmpty)
  }

  test("reported statistics drive join planning: auto-broadcast vs sort-merge") {
    def planFor(extra: Map[String, String]): String = {
      val reader = spark.read.format(GatherSource.Format)
        .schema(GatherSource.ProjectsSchema)
        .option("url", SyncInputs.projectsWireUrl(spark, sf001))
      val v2 = extra.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load().select("id", "p_md5")
      // large enough that Catalyst's size estimate (8 B/row × 5M) clears
      // the broadcast threshold — the fact side must never be the
      // broadcast candidate (plan-only; nothing executes)
      val fact = spark.range(5000000).select(
        (col("id") % 500 + 1000000).as("id"), col("id").as("payload"))
      // no broadcast() hint anywhere — the join strategy must come from
      // the scan's reported statistics alone
      fact.join(v2, "id").queryExecution.executedPlan.toString
    }
    // landed-file transport: footprint measured from disk, well under the
    // broadcast threshold -> auto-broadcast
    val small = planFor(Map.empty)
    assert(small.contains("BroadcastHashJoin"),
      s"small measured V2 scan should auto-broadcast:\n$small")
    // caller-declared catalog stats saying the list is huge -> no
    // broadcast (the default no-stats behavior is also this)
    val huge = planFor(Map("statsSizeBytes" -> (64L << 30).toString))
    assert(!huge.contains("BroadcastHashJoin") &&
      (huge.contains("SortMergeJoin") || huge.contains("ShuffledHashJoin")),
      s"declared-huge V2 scan must not broadcast:\n$huge")
  }

  test("nested consumption prunes the wire read through the projection") {
    val nested = SyncInputs.nestedProjectsV2(spark, sf001)
      .filter(col("metadata.file").isNotNull)
      .select(col("id"), col("metadata.file.md5").as("md5"))
    val desc = scanDescription(nested)
    // only the columns the nesting projection actually needs are read
    assert(desc.contains("ReadSchema: struct<id:bigint,p_md5:string>"),
      s"nested projection did not prune the V2 read:\n$desc")
    assert(nested.count() == SyncInputs.projects(spark, sf001).count())
  }
}

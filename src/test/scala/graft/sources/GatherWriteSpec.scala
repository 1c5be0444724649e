package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, TableCapability}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.SparkSpec
import graft.sources.v2.GatherSource

/** The DSv2 write boundary: a planned V2 BatchWrite (not a foreachPartition
  * side-door), replay idempotence on both transports, and scan↔write
  * round-trip symmetry.
  */
class GatherWriteSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def sampleDf(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"f$i.shp", s"md5_$i"))
      .toDF("ord", "file", "md5")
      .repartition(3, $"ord").sortWithinPartitions("ord")
  }

  test("write plans a V2 BatchWrite (capability + AppendData in the executed plan)") {
    val table = new GatherSource().getTable(GatherSource.ProjectsSchema,
      Array.empty, new java.util.HashMap[String, String]())
    assert(table.isInstanceOf[SupportsWrite])
    assert(table.capabilities().contains(TableCapability.BATCH_WRITE))

    val planned = new java.util.concurrent.atomic.AtomicReference[String]("")
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        if (qe.executedPlan.toString.contains("GatherWrite")) {
          planned.set(qe.executedPlan.toString); latch.countDown()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val dir = java.nio.file.Files.createTempDirectory("graft-write-plan")
    try {
      graft.sink.Actions.applyV2(sampleDf(9), dir.toString)
      assert(latch.await(30, TimeUnit.SECONDS),
        "no query execution carrying a GatherWrite was observed")
      assert(planned.get().contains("AppendData"),
        s"expected a V2 AppendData node, got:\n${planned.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("file transport: round-trip through the scan, re-landing is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-write-land")
    val df = sampleDf(30)
    graft.sink.Actions.applyV2(df, dir.toString)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ord",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("md5",
        org.apache.spark.sql.types.StringType)))
    def readBack(): Seq[(Long, String, String)] =
      spark.read.format(GatherSource.Format).schema(schema)
        .option("url", dir.toString).load()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq

    val first = readBack()
    assert(first == (1 to 30).map(i => (i.toLong, s"f$i.shp", s"md5_$i")))
    // no hidden temp files survive the commit
    val names = java.nio.file.Files.list(dir).iterator()
    import scala.jdk.CollectionConverters._
    assert(names.asScala.forall(!_.getFileName.toString.startsWith(".")))

    // re-landing the same batch replaces the same part names: no growth
    graft.sink.Actions.applyV2(df, dir.toString)
    assert(readBack() == first, "re-landing the same batch must be a no-op")

    // re-landing a DIFFERENT batch with FEWER partitions must not leave
    // stale parts from the wider batch behind: the job commit enforces
    // the one-batch-per-dir contract (directory == last committed batch)
    import spark.implicits._
    val df2 = (101 to 110).map(i => (i.toLong, s"g$i.shp", s"md5_$i"))
      .toDF("ord", "file", "md5").coalesce(1)
    graft.sink.Actions.applyV2(df2, dir.toString)
    assert(readBack() == (101 to 110)
      .map(i => (i.toLong, s"g$i.shp", s"md5_$i")),
      "stale parts from the previous wider batch leaked into the read")
  }

  test("streaming write: epoch-named parts, replaying the stream lands identically") {
    val land = java.nio.file.Files.createTempDirectory("graft-stream-sink-spec")
    def runOnce(): Seq[String] = {
      // fresh checkpoint each run = a full replay of the same finite
      // stream; AvailableNow reproduces the same epoch ids, so the same
      // part names are overwritten with the same bytes
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt-spec")
      graft.streaming.EventStream
        .tumblingSinkV2To(spark, sf001, land.toString, ckpt.toString)
        .collect().map(_.toString).toSeq
    }
    val first = runOnce()
    assert(first.nonEmpty)
    import scala.jdk.CollectionConverters._
    val names = java.nio.file.Files.list(land).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(names.forall(_.matches("part-\\d{5}-\\d{5}\\.jsonl")),
      s"expected epoch-partition part names, got $names")
    assert(runOnce() == first, "a replayed stream must land identically")
    assert(java.nio.file.Files.list(land).iterator().asScala.size == names.size,
      "replay must overwrite epoch files, not accrete new ones")
    // matches the batch append-mode twin exactly (the oracle's claim)
    val batch = graft.streaming.EventStream.tumblingHourlyAppend(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(first == batch)
  }

  test("http transport: batches land once under idempotency keys; replay dedupes") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val applied = new ConcurrentHashMap[String, String]() // key -> body
    val deliveries = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/actions", (ex: HttpExchange) => {
      deliveries.incrementAndGet()
      val key = ex.getRequestHeaders.getFirst("Idempotency-Key")
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      applied.putIfAbsent(key, body)
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/actions"
      val df = sampleDf(30)
      // batchSize 4 chunks each hash-partition into ceil(size/4) batches
      graft.sink.Actions.applyV2(df, url, batchSize = 4)
      val chunks = applied.size()
      assert(chunks >= 8 && chunks == deliveries.get(),
        s"every chunk must land under its own key: $chunks keys, " +
          s"${deliveries.get()} deliveries")
      val all = applied.values().toArray.mkString
      (1 to 30).foreach(i => assert(all.contains(s""""md5":"md5_$i"""")))

      // replaying the same table reproduces the same bodies -> same keys
      graft.sink.Actions.applyV2(df, url, batchSize = 4)
      assert(deliveries.get() == 2 * chunks)
      assert(applied.size() == chunks, "replay must not mint new idempotency keys")
    } finally server.stop(0)
  }
}

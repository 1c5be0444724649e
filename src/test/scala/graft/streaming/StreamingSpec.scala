package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

/** ST1/ST2 — streaming variants agree with their batch twins. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg (AvailableNow) == batch tumbling agg (ST2 snapshot)") {
    val stream = EventStream.tumblingHourly(spark, sf001).collect()
    val batch = graft.ext.Events.tumblingHourly(spark, sf001).collect()
    assert(stream.toSeq.map(_.toSeq) == batch.toSeq.map(_.toSeq))
  }

  test("session_window count matches gaps-and-islands session count") {
    val stream = EventStream.sessionWindows(spark, sf001)
    val batch = graft.ext.Events.sessionize(spark, sf001)
    assert(stream.count() == batch.count())
  }

  test("file-watch snapshot: quiesced inventory of a temp dir (ST1+S1)") {
    val root = Files.createTempDirectory("graft-watch")
    Files.createDirectories(root.resolve("d"))
    Files.write(root.resolve("d/one.shp"), "one".getBytes)
    Files.write(root.resolve("d/two.shp"), "two".getBytes)
    Files.write(root.resolve("d/skip.txt"), "skip".getBytes)
    val snap = FileWatch.snapshot(spark, root.toString).collect()
    assert(snap.map(_.getAs[String]("file")).toSeq == Seq("d/one.shp", "d/two.shp"))
  }
}

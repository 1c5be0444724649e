package graft.streaming

import java.nio.file.{Files, Paths}
import graft.{GraftConfig, InMemoryGatherClient, SparkSpec}

/** End-to-end continuous mode: files arriving across epochs become creates
  * and rename-updates on the remote, with the checkpoint guaranteeing each
  * file is reconciled exactly once.
  */
class StreamingSyncSpec extends SparkSpec {

  private def write(root: java.nio.file.Path, rel: String, body: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes("UTF-8"))
    ()
  }

  test("streaming sync: epoch 1 creates, epoch 2 creates new + renames moved") {
    val root = Files.createTempDirectory("graft-ssync")
    val ckpt = Files.createTempDirectory("graft-ssync-ckpt").toString
    write(root, "a/one.shp", "content-one")
    write(root, "b/two.shp", "content-two")
    val config = GraftConfig(path = root.toString)
    val client = new InMemoryGatherClient(spark)

    StreamingSync.run(spark, config, client, ckpt)
    val after1 = client.projects.orderBy("p_file").collect()
    assert(after1.length == 2)
    assert(after1.map(_.getAs[String]("p_file")).toSeq ==
      Seq("a/one.shp", "b/two.shp"))

    // epoch 2: one genuinely new file + one file that is "a/one.shp"
    // moved — same bytes, new path -> rename update, NOT a create
    write(root, "c/three.shp", "content-three")
    write(root, "moved/one.shp", "content-one")
    StreamingSync.run(spark, config, client, ckpt)
    val after2 = client.projects.orderBy("p_file").collect()
    assert(after2.length == 3, after2.mkString(","))
    assert(after2.map(_.getAs[String]("p_file")).toSeq ==
      Seq("b/two.shp", "c/three.shp", "moved/one.shp"))

    // a third run with nothing new applies nothing (checkpointed source
    // delivers no rows -> no epoch side effects)
    StreamingSync.run(spark, config, client, ckpt)
    assert(client.projects.count() == 3)
  }
}

package graft.tables

import graft.SparkSpec

class ScratchSpec extends SparkSpec {

  test("scratch dirs land under the session's local-dir root and are distinct") {
    val base = spark.conf.getOption("spark.local.dir")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .map(_.split(",").head.trim).filter(_.nonEmpty)
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val a = Scratch.dir(spark, "graft-scratch-spec")
    val b = Scratch.dir(spark, "graft-scratch-spec")
    assert(java.nio.file.Files.isDirectory(a))
    assert(a != b, "each call must mint a fresh directory")
    assert(a.startsWith(java.nio.file.Paths.get(base)),
      s"scratch dir $a escaped the local-dir root $base")
    // cleanup itself runs in Scratch's JVM shutdown hook — only its
    // registration side effects are observable here, not its execution
  }
}

package graft.tables

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession

/** Driver-local scratch directories for landed harness fixtures (the wire
  * file the V2 source scans, the streaming flush sentinels).
  *
  * LOCAL-MODE ASSUMPTION, explicit: these paths are written by a Spark job
  * and re-read by another, which only works when driver and executors
  * share a filesystem — true in local mode (where the harness runs) and on
  * a shared mount, not on a multi-node cluster with executor-local disks.
  * At cluster scale the same fixtures land on shared storage (object
  * store / DFS) and nothing here changes but the base path.
  *
  * Paths derive from `spark.local.dir` when set (the operator's designated
  * scratch volume — right sizing/cleanup policy), falling back to the JVM
  * temp dir, and every directory is registered for recursive removal in
  * one JVM shutdown hook, so repeated harness runs don't accrete orphaned
  * fixture dirs the way bare `Files.createTempDirectory` calls did.
  */
object Scratch {

  private val created = new ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { root =>
        try {
          if (Files.exists(root)) {
            import scala.jdk.CollectionConverters._
            Files.walk(root).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)  // children before parents
              .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
          }
        } catch { case _: Throwable => () } // best-effort: never block shutdown
      }
    }, "graft-scratch-cleanup"))
  }

  /** A fresh scratch directory under the session's local-dir root,
    * cleaned up on JVM exit.
    */
  def dir(spark: SparkSession, prefix: String): Path = {
    hook
    val base = spark.conf.getOption("spark.local.dir")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .map(_.split(",").head.trim)
      .filter(_.nonEmpty)
      .map(Paths.get(_))
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    Files.createDirectories(base)
    val p = Files.createTempDirectory(base, prefix)
    created.add(p)
    p
  }
}

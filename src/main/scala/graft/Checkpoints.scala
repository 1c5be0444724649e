package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage cuts for iterative operators, with a durability switch.
  *
  * `localCheckpoint()` stores blocks on executors — fast, but an executor
  * loss mid-iteration fails the job because the truncated lineage cannot
  * recompute the lost blocks. That is the right default on local[k]
  * (executors = the driver JVM). On a real cluster, set
  * `graft.checkpoint.dir` to a durable location (HDFS/object storage) and
  * every iterative operator switches to reliable `checkpoint()`: same
  * plan-size-O(1) semantics, blocks survive executor loss at the price of
  * a write per round — the standard trade for long CC/BFS jobs at scale.
  */
object Checkpoints {

  /** Session conf key: durable checkpoint directory. Unset/empty → fast
    * executor-local checkpoints.
    */
  val ConfKey = "graft.checkpoint.dir"

  // setCheckpointDir appends a UUID subdir, so the raw conf value can't be
  // compared against sc.getCheckpointDir — remember what we last applied.
  private val applied =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def durableDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty)

  /** Cut `df`'s lineage: reliable `checkpoint()` into the configured
    * directory when `graft.checkpoint.dir` is set, executor-local blocks
    * otherwise. Eager either way (callers rely on materialize-then-probe
    * ordering).
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    durableDir(spark) match {
      case Some(dir) =>
        val app = spark.sparkContext.applicationId
        if (!applied.get(app).contains(dir)) {
          spark.sparkContext.setCheckpointDir(dir)
          applied.put(app, dir)
        }
        df.checkpoint()
      case None =>
        df.localCheckpoint()
    }
  }
}

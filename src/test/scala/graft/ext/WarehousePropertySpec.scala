package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws of the maintenance operators over GENERATED logs and
  * change sets (fixed-seed ScalaCheck, same convention as
  * GeneratedInputSpec): the properties a re-runnable pipeline depends on,
  * which single-fixture checks can't establish.
  */
class WarehousePropertySpec extends SparkSpec {
  import spark.implicits._

  private val keyGen = Gen.choose(1L, 8L)
  private val logGen = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, Gen.zip(keyGen, Gen.oneOf("I", "U", "D"),
      Gen.choose(0L, 999L)))
  } yield rows.zipWithIndex.map { case ((k, op, v), i) =>
    (i.toLong, k, op, v, "en")
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def toLog(rows: Seq[(Long, Long, String, Long, String)]) =
    rows.toDF("seq", "key", "op", "val", "lang")

  test("cdcApply equals a sequential fold of the log, on 12 generated logs") {
    (1 to 12).foreach { seed =>
      val rows = sample(logGen, seed.toLong)
      // reference semantics: replay the log in seq order into a map
      val expected = rows.sortBy(_._1).foldLeft(Map.empty[Long, (Long, String)]) {
        case (st, (_, k, "D", _, _)) => st - k
        case (st, (_, k, op, v, _))  => st + (k -> (v, op))
      }
      val got = Warehouse.cdcApply(toLog(rows)).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
      assert(got == expected, s"seed $seed: fold disagrees")
    }
  }

  test("cdcApply is idempotent: compacting the compacted state is identity") {
    (1 to 6).foreach { seed =>
      val rows = sample(logGen, seed.toLong * 31)
      val once = Warehouse.cdcApply(toLog(rows))
        .select(col("key"), col("val"), col("lang"))
      // re-feed the snapshot as a fresh insert-only log
      val relog = once.select(col("key").as("seq"), col("key"),
        lit("I").as("op"), col("val"), col("lang"))
      val twice = Warehouse.cdcApply(relog)
        .select(col("key"), col("val"), col("lang"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
        s"seed $seed: not idempotent")
    }
  }

  test("mergeUpsert composes: sequential merges equal one merged change set (disjoint keys)") {
    val base = (1L to 12L).map(k => (k, s"n$k", BigDecimal(k * 10)))
      .toDF("key", "name", "bal")
    // c1 touches keys 1..6, c2 touches 7..12 and inserts 100+ — disjoint,
    // so applying them in sequence must equal applying their union
    val c1 = Seq((2L, "u2", BigDecimal(99), "U"), (3L, "x", BigDecimal(0), "D"))
      .toDF("key", "u_name", "u_bal", "op")
    val c2 = Seq((8L, "u8", BigDecimal(88), "U"), (101L, "new", BigDecimal(1), "I"))
      .toDF("key", "u_name", "u_bal", "op")
    def strip(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "name", "bal")
    val seq2 = strip(Warehouse.mergeUpsert(
      // re-shape the intermediate result back to (key, name, bal DECIMAL)
      Warehouse.mergeUpsert(base, c1)
        .select(col("key"), col("name"),
          col("bal").cast("decimal(18,2)").as("bal")),
      c2))
    val union = strip(Warehouse.mergeUpsert(base, c1.unionByName(c2)))
    assert(seq2.exceptAll(union).isEmpty && union.exceptAll(seq2).isEmpty)
  }
}

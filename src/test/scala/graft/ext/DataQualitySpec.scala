package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DQ checks must actually catch planted violations — the fixture
  * report passing everywhere is necessary but not evidence.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("referential violations: orphan children surface as rows") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "orphan")).toDF("fk", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val v = DataQuality.referentialViolations(child, "fk", parent, "pk")
      .collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("uniqueness violations: duplicated keys surface with their counts") {
    val df = Seq((1L, 1), (1L, 2), (2L, 1), (1L, 3)).toDF("k", "sub")
    val v = DataQuality.uniquenessViolations(df, Seq("k")).collect()
    assert(v.length == 1 && v.head.getLong(0) == 1L && v.head.getLong(1) == 3L)
    // composite key: no violations when the pair is unique
    assert(DataQuality.uniquenessViolations(df, Seq("k", "sub")).isEmpty)
  }

  test("domain violations: rows failing the predicate surface") {
    val df = Seq(1.0, -2.0, 3.0, -0.5).toDF("x")
    val v = DataQuality.domainViolations(df, col("x") > 0).collect()
    assert(v.map(_.getDouble(0)).sorted.toSeq == Seq(-2.0, -0.5))
  }

  test("fixture report: referential/domain checks pass; the known fixture defect is reported") {
    val rows = DataQuality.report(spark, sf001).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toMap
    assert(rows.size == 9)
    rows.foreach { case (name, (n, passed)) => assert(passed == (n == 0), name) }
    // the fixture's lineitem linenumbers genuinely repeat within an order:
    // the report must SAY so, not paper over it
    assert(!rows("unique_lineitem_key")._2 && rows("unique_lineitem_key")._1 > 0)
    Seq("fk_lineitem_orders", "fk_orders_customer", "fk_supplier_nation",
      "unique_orders_key", "unique_documents_key",
      "domain_lineitem_qty_positive", "domain_lineitem_discount_range",
      "domain_documents_nonempty").foreach(c => assert(rows(c)._2, c))
  }
}

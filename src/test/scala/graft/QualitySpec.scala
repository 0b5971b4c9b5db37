package graft

import org.apache.spark.sql.functions._

/** The dq_audit gate must FAIL on violations, not just pass on clean
  * data — each test plants one corruption in a copy of the sf0.001
  * tables and asserts exactly the matching check flips to passed=0. */
class QualitySpec extends SparkSuite {

  /** Writes (possibly corrupted) orders/customer copies into a temp sf
    * dir and returns the audit keyed by check name. */
  private def auditWith(tag: String,
                        mutate: org.apache.spark.sql.DataFrame =>
                                org.apache.spark.sql.DataFrame,
                        dropCustomers: Boolean = false)
      : Map[String, (Double, Long)] = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_dq_$tag").toString
    mutate(Tables.orders(spark, sf()))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val cust = Tables.customer(spark, sf())
    (if (dropCustomers) cust.filter(col("c_custkey") % 2 === 0) else cust)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    graft.operators.Quality.auditOrders(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
  }

  test("clean tables pass every check") {
    val a = auditWith("clean", identity)
    assert(a.values.forall(_._2 == 1L), a.toString)
    assert(a("key_uniqueness")._1 == 1.0)
  }

  test("duplicated keys fail key_uniqueness only") {
    val o = Tables.orders(spark, sf())
    val a = auditWith("dup", _ => o.union(o.limit(10)))
    assert(a("key_uniqueness")._2 == 0L, a.toString)
    assert(a("key_completeness")._2 == 1L)
    assert(a("key_uniqueness")._1 < 1.0)
  }

  test("null keys fail key_completeness (and uniqueness stays 1)") {
    val a = auditWith("null", o => o.withColumn("o_orderkey",
      when(col("o_orderkey") % 100 === 0, lit(null))
        .otherwise(col("o_orderkey"))))
    assert(a("key_completeness")._2 == 0L, a.toString)
  }

  test("out-of-range prices fail price_in_range") {
    val a = auditWith("range", o => o.withColumn("o_totalprice",
      when(col("o_orderkey") % 500 === 0, lit(-1.0))
        .otherwise(col("o_totalprice"))))
    assert(a("price_in_range")._2 == 0L, a.toString)
  }

  test("unknown status fails status_in_set") {
    val a = auditWith("set", o => o.withColumn("o_orderstatus",
      when(col("o_orderkey") % 500 === 0, lit("X"))
        .otherwise(col("o_orderstatus"))))
    assert(a("status_in_set")._2 == 0L, a.toString)
  }

  test("orphaned foreign keys fail custkey_ri with the orphan count") {
    val a = auditWith("ri", identity, dropCustomers = true)
    assert(a("custkey_ri")._2 == 0L, a.toString)
    assert(a("custkey_ri")._1 > 0.0)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

/** FK-consistent scale-up: replicated keys must shift TOGETHER across
  * referencing tables, so join fan-outs and per-key distributions are
  * preserved exactly (the property the sf1 self-bench relies on).
  */
class ScaleUpSpec extends SparkSpec {

  test("scaleTable: K copies, FK pairs shift together, join counts scale K×") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("scaleup").toString
    Seq((0L, "alice"), (1L, "bob"), (2L, "carol"))
      .toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    // customer 0 has 2 orders, 1 has 1, 2 has none (skew preserved?)
    Seq((10L, 0L, 5.0), (11L, 0L, 7.0), (12L, 1L, 9.0))
      .toDF("o_orderkey", "o_custkey", "o_total")
      .write.parquet(s"$dir/orders.parquet")

    val cust = ScaleUp.scaleTable(spark, dir, "customer", 3)
    val ords = ScaleUp.scaleTable(spark, dir, "orders", 3)
    assert(cust.count() == 9 && ords.count() == 9)
    // keys distinct across copies
    assert(cust.select("c_custkey").distinct().count() == 9)
    assert(ords.select("o_orderkey").distinct().count() == 9)
    // FK join: every order still finds exactly one customer, 3× rows
    val joined = ords.join(cust, col("o_custkey") === col("c_custkey"))
    assert(joined.count() == 9)
    // per-key distribution preserved: every copy of customer 0 has 2
    // orders, of customer 1 has 1, of customer 2 none
    val fan = joined.groupBy("c_name", "c_custkey").count()
      .groupBy("c_name").agg(countDistinct("c_custkey").as("copies"),
        collect_set("count").as("fans"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toSet))).toMap
    assert(fan("alice") == ((3L, Set(2L))))
    assert(fan("bob") == ((3L, Set(1L))))
    assert(!fan.contains("carol")) // still orderless in every copy
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark

  test("bucketed tables join with zero shuffle exchanges") {
    // (warehouse dir is a static conf — managed tables land in
    // ./spark-warehouse; DROP TABLE in finally removes the files)
    val li = Tables(spark, TestSpark.Sf, "lineitem")
      .withColumnRenamed("l_orderkey", "orderkey")
    val o = Tables(spark, TestSpark.Sf, "orders")
      .withColumnRenamed("o_orderkey", "orderkey")
    Bucketing.writeBucketed(li, "li_bkt", "orderkey", 8)
    Bucketing.writeBucketed(o, "o_bkt", "orderkey", 8)
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_bkt", "o_bkt", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      assert(joined.count() ==
        li.join(o, "orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}

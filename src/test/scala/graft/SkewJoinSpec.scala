package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  test("salted join returns exactly the rows of the plain join") {
    val orders = Tables(spark, TestSpark.Sf, "orders")
    val customer = Tables(spark, TestSpark.Sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewJoin.salted(orders, customer, "o_custkey", salt = 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("left join keeps unmatched fact rows exactly once") {
    val orders = Tables(spark, TestSpark.Sf, "orders")
    val few = Tables(spark, TestSpark.Sf, "customer")
      .where(col("c_custkey") < 10)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(few, Seq("o_custkey"), "left_outer")
    val salted = SkewJoin.salted(orders, few, "o_custkey", 4, "left_outer")
    assert(salted.count() == plain.count())
  }
}

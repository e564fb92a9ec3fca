package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Scale-posture mechanisms: salted skew joins keep results identical to
  * plain joins while spreading hot keys; bucketed tables co-locate join
  * sides so the join runs with zero Exchange (the pre-shuffled layout a
  * 100 TB fact table would be stored in). */
class ScaleSpec extends SparkSpec {

  test("salted join == plain join results; hot key spread over salts") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = SkewJoin.saltedEquiJoin(li, o, "l_orderkey", saltBuckets = 8)
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(plain == salted)
    // the salt really fans out: the hottest key's rows land on >1 salt
    // (if the salt degenerated to a constant per key, skew mitigation
    // would silently stop working)
    val hotKey = li.groupBy(col("l_orderkey")).count()
      .orderBy(col("count").desc, col("l_orderkey")).first().getLong(0)
    val salts = li.filter(col("l_orderkey") === hotKey)
      .withColumn("s", pmod(hash(li.columns.toSeq.map(col): _*), lit(8)))
      .select(countDistinct(col("s"))).collect()(0).getLong(0)
    assert(salts > 1, s"hot key $hotKey rows all hashed to one salt")
  }

  test("bucketed tables join without any Exchange (co-located join)") {
    val wh = Files.createTempDirectory("graft-warehouse")
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-BHJ
    Tables.lineitem(s, sf0001).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(s, sf0001).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_b")
    val joined = s.table("li_b")
      .join(s.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // bucket layout satisfies the join's distribution: no shuffle before it
    assert(!plan.split("SortMergeJoin")(1).contains("Exchange") ||
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles:\n$plan")
  }
}

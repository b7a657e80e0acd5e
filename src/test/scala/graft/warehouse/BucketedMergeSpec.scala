package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The 100 TB merge story, executed: with the warehouse side stored
  * bucketed on the merge keys, the keyed anti-join reads the big side
  * WITHOUT a shuffle — only the incoming micro-batch exchanges. */
class BucketedMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merge against a bucketed warehouse table: big side joins exchange-free") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val base = (1L to 10000L).map(i => (i, s"v$i")).toDF("id", "v")
      Warehouse.writeBucketed(base, "wh_bucketed", Seq("id"), buckets = 8)
      val existing = spark.table("wh_bucketed")
      val batch = Seq((5L, "V5"), (10001L, "new")).toDF("id", "v")
      val merged = Warehouse.mergeByKey(existing, batch, Seq("id"))

      // correctness: upsert semantics hold
      val out = merged.filter(col("id").isin(5L, 42L, 10001L))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(5L -> "V5", 42L -> "v42", 10001L -> "new"))

      // plan: no exchange between the bucketed scan and the anti-join —
      // walk up from the file scan; the first join ancestor must be
      // reachable without crossing a shuffle
      val plan = merged.queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join in:\n$plan")
      val anti = smjs.find(_.joinType.toString.contains("LeftAnti")).getOrElse(smjs.head)
      val bigSideShuffles = anti.left.collect { case e: ShuffleExchangeExec => e }
      assert(bigSideShuffles.isEmpty,
        s"bucketed side shuffled before the merge join:\n${anti.left}")
      val smallSideShuffles = anti.right.collect { case e: ShuffleExchangeExec => e }
      assert(smallSideShuffles.nonEmpty, "incoming batch should shuffle to match buckets")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS wh_bucketed")
    }
  }
}

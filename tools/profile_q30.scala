// Profile q30 spatial-join stages (spark-shell -i; dev tool, not shipped)
import org.apache.spark.sql.functions._
import graft.functions._
import graft.geo.GeoFunctions._

val dir = "/root/testdata/sf0.1"
def time[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
}
spark.range(1000000L).agg(sum("id")).collect

val q = graft.SparkEntry.queries("q30_spatial_join")
for (i <- 1 to 3) time(s"full q30 pass $i")(q(spark, dir).count)

// pieces: points + rects
val pts = spark.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"),
  stPoint((col("c_custkey") % 97).cast("double"),
    ((col("c_custkey") * 7) % 89).cast("double")).as("pt"))
println("pts: " + pts.count)
for (i <- 1 to 2) time(s"point WKB build+cells pass $i")(
  pts.select(col("c_custkey"), explode(stCoveredCells(col("pt"), lit(16.0))).as("c")).count)
// verify-stage cost in isolation: intersects UDF over the candidate set scale
val cand = pts.limit(200000)
for (i <- 1 to 2) time(s"intersects UDF 200k pass $i")(
  cand.select(stIntersects(col("pt"), col("pt")).as("b")).filter(col("b")).count)
System.exit(0)

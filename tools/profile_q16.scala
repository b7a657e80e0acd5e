// Profile q16 simhash stages (run via spark-shell -i; dev tool, not shipped)
import org.apache.spark.sql.functions._
import graft.functions._

val dir = "/root/testdata/sf0.1"
def time[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime; val r = f
  println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
}
val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"), col("source"))
val corpus = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000)
  .withColumn("text", concat(col("text"), lit(" xq"))))
// warmup
spark.range(1000000L).agg(sum("id")).collect
println("corpus rows: " + corpus.count)

val base = corpus.select(col("doc_id").as("id"), simHash(col("text")).as("sh"))
for (i <- 1 to 3) time(s"simhash-only pass $i")(base.agg(max(col("sh"))).collect)

val banded = base.select(col("id"), col("sh"),
  explode(array((0 until 4).map(i =>
    struct(lit(i).as("band"),
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("bk"))
for (i <- 1 to 3) time(s"banded+groupBy-count pass $i")(
  banded.groupBy("bk").count.agg(count(lit(1)).as("buckets"), max("count"),
    sum(expr("count*(count-1)/2")).as("pair_volume")).show)

for (i <- 1 to 3) time(s"collectMinK agg pass $i")(
  banded.groupBy(col("bk")).agg(collectMinK(col("id"), col("sh"), 1024).as("g"))
    .agg(sum(size(col("g.items")))).collect)

for (i <- 1 to 3) time(s"full q16 pass $i")(
  graft.ops.Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 8)
    .orderBy(col("a_id"), col("b_id")).count)
System.exit(0)

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic N× upscale of a driver scale-factor directory — the
  * input side of the sf1 smoke lane (`tools/sf1_smoke.sh`): the scale
  * proof runs the heavy query tails at 10× the graded bench SF and
  * gates on the time ratio, which is only meaningful if the WORKLOAD
  * scales linearly by construction. Each fact table becomes N id-spaced
  * copies (offset `c << 50`, far above the 2^40/2^41 twin offsets the
  * dedup queries add internally), with copy-decorrelation where
  * identical copies would create super-linear cross-copy work:
  *
  *   - `documents.text`: copies ≥ 1 pass through a copy-specific
  *     CHARACTER SUBSTITUTION cipher (`translate` rotating a–z/A–Z/0–9
  *     by a per-copy stride). A string bijection preserves every
  *     within-copy similarity EXACTLY — token boundaries, shingle-set
  *     sizes, word AND char n-gram Jaccard relations, MinHash bucket
  *     geometry — while cross-copy grams share only punctuation runs,
  *     so near-dup work scales ×N. (A first attempt suffixed every
  *     token `_c<N>`; that kept WORD-gram structure but injected the
  *     same char-grams into every doc of a copy, inflating background
  *     char-6-gram similarity and LSH collision rates ~70× — the
  *     cipher keeps char statistics isomorphic instead);
  *   - `embeddings.embedding`: dimensions cyclically rotated by a
  *     copy-specific stride — any fixed permutation preserves all
  *     within-copy distances exactly, while cross-copy cosines decay to
  *     background, so ANN/near-dup candidate work scales ×N;
  *   - relational keys (orderkey/custkey/partkey/suppkey/user_id/
  *     event_id) offset per copy: joins, graphs, and groupBys see N
  *     disjoint replicas — linear by construction.
  *
  * Dimension tables (region, nation) pass through unscaled, exactly as
  * TPC-H holds them fixed across SFs; scaled facts keep their original
  * nation FKs, so dim joins stay broadcast-sized at any scale. */
object ScaleData {

  /** id-key columns to offset, per table */
  private val idCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Zipfian hot-key plant (round-10 skew lane): real 100 TB corpora
    * are not uniform — one bot user, one boilerplate page, one
    * best-selling part can carry ≥10% of a key's rows, and AQE's
    * skew-join splitting does NOT rescue hash aggregations or
    * iterative-join hot keys. With `skew = true`, rows whose driving id
    * ≡ 0 (mod 10) — i.e. 10% of every copy — collapse onto ONE key:
    *
    *   - orders: `o_custkey` → 1 (one customer on 10% of orders — a
    *     hot node in the cust⇄supp trade graph the graph kernels run);
    *   - lineitem: `l_partkey` → 1 on the same hot orders (one part
    *     family in 10% of baskets — a star node in the co-purchase
    *     graph: q186 CC, q155/q180/q209);
    *   - events: `user_id` → 1 (one user with 10% of events — the
    *     q134 salted-join shape at its design load);
    *   - documents: `text` → one fixed string (10% of the corpus one
    *     giant duplicate cluster — the LSH bucket caps and dedup-CC
    *     giant-component path at their design load).
    *
    * The plant key (1) exists in copy 0's id space, below every copy
    * offset and the 2^40/2^41 twin offsets. */
  private val hotText =
    "the quick brown fox jumps over the lazy dog while the slow " +
      "grey wolf watches the bright red hen peck at the dry brown corn " +
      "near the old stone wall under the pale blue sky"

  def scaled(spark: SparkSession, baseDir: String, name: String,
      copies: Int, skew: Boolean = false): DataFrame = {
    val base = Tables.t(spark, baseDir, name)
    if (!idCols.contains(name)) base
    else {
      val dim = if (name == "embeddings")
        base.select(max(size(col("embedding")))).head().getInt(0)
      else 0
      (0 until copies).map { c =>
        val offset = c.toLong << 50
        var df = idCols(name).foldLeft(base) { (d, k) =>
          d.withColumn(k, col(k) + lit(offset)) }
        if (c > 0 && name == "documents") {
          val lower = ('a' to 'z').mkString
          val upper = ('A' to 'Z').mkString
          val digit = ('0' to '9').mkString
          def rot(s: String, by: Int): String = {
            val n = s.length
            val k = ((by % n) + n) % n
            s.substring(k) + s.substring(0, k)
          }
          df = df.withColumn("text", translate(col("text"),
            lower + upper + digit,
            rot(lower, c) + rot(upper, c) + rot(digit, c)))
        }
        if (c > 0 && name == "embeddings") {
          val s = (c * 13) % dim max 1
          df = df.withColumn("embedding",
            concat(slice(col("embedding"), s + 1, dim - s),
              slice(col("embedding"), 1, s)))
        }
        if (skew) name match {
          case "orders" => df = df.withColumn("o_custkey",
            when(pmod(col("o_orderkey"), lit(10)) === 0, lit(1L))
              .otherwise(col("o_custkey")))
          case "lineitem" => df = df.withColumn("l_partkey",
            when(pmod(col("l_orderkey"), lit(10)) === 0, lit(1L))
              .otherwise(col("l_partkey")))
          case "events" => df = df.withColumn("user_id",
            when(pmod(col("event_id"), lit(10)) === 0, lit(1L))
              .otherwise(col("user_id")))
          case "documents" => df = df.withColumn("text",
            when(pmod(col("doc_id"), lit(10)) === 0, lit(hotText))
              .otherwise(col("text")))
          case _ => ()
        }
        df
      }.reduce(_.unionByName(_))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleData <baseSfDir> <outDir> [copies=10] [--skew]")
    val (baseDir, outDir) = (args(0), args(1))
    val copies = args.lift(2).filterNot(_ == "--skew").map(_.toInt)
      .getOrElse(10)
    val skew = args.contains("--skew")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.Names.foreach { name =>
      scaled(spark, baseDir, name, copies, skew)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"scaled $name x$copies${if (skew) " +skew" else ""}" +
        s" -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}

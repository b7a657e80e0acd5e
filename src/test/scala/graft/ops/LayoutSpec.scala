package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Bit-at-a-time reference interleave, independent of the magic-mask
    * implementation under test. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("zValue matches the bit-at-a-time reference on edge and random inputs") {
    val cases = Seq[(Long, Long)](
      (0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535), (65535, 65535),
      (21845, 43690), (12345, 54321), (256, 255))
    val df = cases.toDF("x", "y").withColumn("z", Layout.zValue(col("x"), col("y")))
    df.select("x", "y", "z").as[(Long, Long, Long)].collect().foreach {
      case (x, y, z) => assert(z == mortonRef(x, y), s"($x, $y)")
    }
  }

  test("zValueN: 2-D agrees with zValue; 3-D matches a bit-at-a-time reference") {
    val two = Seq((21845L, 43690L), (0L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("a"),
        Layout.zValueN(Seq(col("x"), col("y")), 16).as("b"))
      .as[(Long, Long)].collect()
    two.foreach { case (a, b) => assert(a == b) }
    def ref3(x: Long, y: Long, t: Long): Long = {
      var z = 0L
      for (i <- 0 until 8)
        z |= (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) | (((t >> i) & 1L) << (3 * i + 2))
      z
    }
    val three = Seq((255L, 0L, 128L), (17L, 42L, 99L), (255L, 255L, 255L))
      .toDF("x", "y", "t")
      .select(col("x"), col("y"), col("t"),
        Layout.zValueN(Seq(col("x"), col("y"), col("t")), 8).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    three.foreach { case (x, y, t, z) => assert(z == ref3(x, y, t), s"($x,$y,$t)") }
    intercept[IllegalArgumentException](Layout.zValueN(Seq(col("x")), 8))
    intercept[IllegalArgumentException](
      Layout.zValueN(Seq(col("x"), col("y")), 32))
  }

  test("zValue is monotone in each dimension along axis lines") {
    // fixing one coordinate, z must strictly increase with the other —
    // the property that makes min/max pruning work per dimension
    val zs = (0L until 100L).map(x => mortonRef(x, 7))
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("zOrderShards gives tighter per-file bounding boxes than id order") {
    val n = 4096
    val df = spark.range(n).select(col("id"),
      (col("id") % 199).as("x"), ((col("id") * 31) % 173).as("y"))
    def avgBoxArea(shards: org.apache.spark.sql.DataFrame): Double = {
      val boxes = shards
        .select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .select(avg("area")).as[Double].head()
      boxes
    }
    val zArea = avgBoxArea(Layout.zOrderShards(df, col("x"), col("y"), 16))
    val idArea = avgBoxArea(df.repartitionByRange(16, col("id")))
    // x/y are decorrelated from id, so id-range files cover the whole
    // plane; z-range files must cover far less (ratio ~#files in theory)
    assert(zArea < idArea / 4, s"z=$zArea id=$idArea")
  }

  test("hilbert: known order-1 curve, bijective order-4 walk, unit steps") {
    import graft.functions.HilbertKernel.xy2d
    // 2×2 curve: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    assert(xy2d(1, 0, 0) == 0L && xy2d(1, 0, 1) == 1L &&
      xy2d(1, 1, 1) == 2L && xy2d(1, 1, 0) == 3L)
    // order-4: a bijection over the 16×16 grid whose consecutive
    // positions are always GRID NEIGHBORS — the property the Z curve
    // lacks and the reason Hilbert shards have tighter bounding boxes
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield xy2d(4, x, y) -> ((x, y))
    val byD = cells.toMap
    assert(byD.size == 256, "not a bijection")
    assert(byD.keys.min == 0L && byD.keys.max == 255L)
    val maxStep = (0L until 255L).map { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxStep == 1, s"hilbert step must be a unit move, got $maxStep")
    // the Morton curve on the same grid jumps (its Z shape) — the
    // contrast that justifies the extra kernel
    val zByD = (for (x <- 0 until 16; y <- 0 until 16)
      yield ((interleave(x) | (interleave(y) << 1)).toLong, (x, y))).toMap
    val zMax = (0L until 255L).map { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(zMax > 1, "expected the Z curve to jump")
  }

  private def interleave(v: Int): Int =
    (0 until 16).map(i => ((v >> i) & 1) << (2 * i)).reduce(_ | _)

  test("hilbertIndex column matches the kernel and masks into range") {
    import graft.functions.hilbertIndex
    val df = spark.range(50).select(col("id"),
      (col("id") % 7).as("x"), (col("id") % 11).as("y"))
    val got = df.withColumn("h", hilbertIndex(col("x"), col("y"), 4))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (x, y, h) =>
      assert(h == graft.functions.HilbertKernel.xy2d(4, x, y))
    }
  }

  test("zOrderShards plan range-partitions on the z value") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 7).as("x"), (col("id") % 11).as("y"))
    val plan = Layout.zOrderShards(df, col("x"), col("y"), 4, keepZ = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this is
  * the explicit salting form for when one side is small enough to
  * replicate but too big (or too skewed) to broadcast: the big side gets
  * a deterministic salt in [0, factor), the small side is replicated
  * `factor` times, and the join key becomes (key, salt) — a hot key's
  * rows spread over `factor` reducers instead of one.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways.
    * Result is identical to the unsalted join (verified in SkewSpec);
    * only the partitioning changes. Salt is derived from a hash of the
    * big side's whole row so it is deterministic and evenly spread. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality guards (SURVEY §2.3 P6) — the set-oriented form of the
  * reference's raise-on-bad-row asserts (e.g. unexpected `subject`,
  * scripts/bills/bills_federal.py:123-125; role-structure guard,
  * people_utils.py:35-36). */
object Guards {

  /** Eagerly fail if any row violates the predicate (runs a bounded scan
    * — `limit(1)` short-circuits). Use between pipeline stages where the
    * reference raised mid-loop. */
  def failIfAny(df: DataFrame, bad: Column, message: String): DataFrame = {
    val offender = df.filter(bad).limit(1).collect()
    if (offender.nonEmpty)
      throw new IllegalStateException(s"$message — first offender: ${offender.head}")
    df
  }

  /** Zero-extra-pass variant: attach an [[Observation]] counting
    * violations; the caller checks `observation.get` after its action.
    * The metric rides the existing job — no second scan. */
  def observed(df: DataFrame, bad: Column, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, sum(when(bad, 1L).otherwise(0L)).as("violations")), obs)
  }

  /** Shared id-type contract of the heap/arithmetic kernels (LSH bucket
    * pairing, weighted sampling, mixture packing): they eval ids as raw
    * longs, so a non-integral id (e.g. string) casts to null and the op
    * SILENTLY returns empty/garbage — "no duplicates found" on a
    * duplicated corpus. Reject loudly instead, from ONE place so the
    * accepted-type set cannot drift between ops documented as sharing
    * this contract. */
  def requireIntegralId(df: DataFrame, idCol: String, context: String): Unit = {
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    require(integral.contains(idType),
      s"$context needs an integral id column, got $idType — " +
        "map string ids to longs first (e.g. zipWithIndex / monotonically_" +
        "increasing_id kept in a lookup table)")
  }
}

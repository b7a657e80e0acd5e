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
}

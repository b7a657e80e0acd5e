package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.parseFlexibleTimestamp

/** Temporal "current role" resolution (reference:
  * scripts/people/people_utils.py:9-84).
  *
  * The reference walks each person's `roles[]` in order:
  *   - a person with exactly ONE role gets it unconditionally, even a
  *     mayor role or one whose dates exclude now (:24-25);
  *   - otherwise, `mayor` roles are skipped (:31-33);
  *   - a role with both dates containing *now* → returned immediately (:53-55);
  *   - a role with only a start date → remembered as fallback, regardless
  *     of whether the start is past or future (:60-64);
  *   - a role with only a future end date → returned immediately (:67-73);
  *   - a role with no dates → fallback (:75-77);
  *   - fallbacks: **later entries overwrite earlier ones** (:63,77,79-81);
  *   - nothing found → error (:84).
  *
  * Re-expressed as a deterministic ranking: definite roles (priority 2)
  * win over fallbacks (priority 1); among definite roles the *first*
  * array position wins (the loop returns immediately); among fallbacks
  * the *last* position wins (the loop overwrites). That tie-break is
  * `orderBy(priority DESC, if(definite, -pos, pos) DESC)`.
  */
object RoleResolution {

  /** Input: one row per person with an array<struct> `roles` column whose
    * elements have (type, district, jurisdiction, start_date, end_date —
    * dates as strings). `asOf` is "now". Output: person id + the selected
    * role's fields + `role_status` ∈ sole | current | potential; persons
    * with no eligible role are dropped (the reference raises — callers
    * anti-join against the input to produce the error stream). */
  def currentRoles(people: DataFrame, idCol: String, asOf: java.sql.Timestamp): DataFrame = {
    val now = lit(asOf)

    // reference :24-25 — a single role is returned unconditionally
    val singles = people.filter(size(col("roles")) === 1)
      .select(col(idCol), col("roles").getItem(0).as("role"))
      .select(col(idCol), col("role.*"), lit("sole").as("role_status"))

    val multi = people.filter(size(col("roles")) =!= 1)
    val exploded = multi
      .select(col(idCol), posexplode(col("roles")).as(Seq("pos", "role")))
      .filter(col("role.type") =!= "mayor")
      .withColumn("start_ts", parseFlexibleTimestamp(col("role.start_date")))
      .withColumn("end_ts", parseFlexibleTimestamp(col("role.end_date")))
    val scored = exploded.withColumn("priority",
      when(col("start_ts").isNotNull && col("end_ts").isNotNull,
        when(col("start_ts") <= now && now <= col("end_ts"), 2).otherwise(0))
        .when(col("start_ts").isNotNull, 1) // start-only: fallback, no past/future check
        .when(col("end_ts").isNotNull,
          when(col("end_ts") >= now, 2).otherwise(0))
        .otherwise(1)) // no dates: fallback
      .filter(col("priority") > 0)
    val w = Window.partitionBy(col(idCol)).orderBy(
      col("priority").desc,
      when(col("priority") === 2, -col("pos")).otherwise(col("pos")).desc)
    val resolved = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("role.*"),
        when(col("priority") === 2, "current").otherwise("potential").as("role_status"))

    singles.unionByName(resolved)
  }
}

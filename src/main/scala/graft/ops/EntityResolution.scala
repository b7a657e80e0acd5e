package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Blocked fuzzy entity resolution: match raw vote records to canonical
  * person rows (reference: scripts/bills/vote_matching.py:88-212).
  *
  * Reference decision order, reproduced set-wise:
  *   - standardize the voter name: strip "(…)", trim, de-accent (:95-103);
  *   - block on state when the vote carries one (:193-196) and on
  *     chamber only for lower/upper (→ House/Senate, :199-206);
  *   - exact pass (:124-135): walk candidates, first person whose full
  *     name OR last name equals the standardized name case-insensitively
  *     wins — person order, not full-name-first; we make the walk
  *     deterministic by ordering on person_id;
  *   - fuzzy pass (:140-168): WRatio over each candidate's name variants
  *     ("first last", raw name), best score ≥ threshold (80, :178) wins.
  *
  * Scale design: people (candidate side) broadcasts in every stage; the
  * state-blocked path is an equi-join on state, the rare no-state path a
  * broadcast nested-loop against the (small) people table — votes, the
  * big side, never shuffles except for the per-vote top-1 window, which
  * partitions on vote_id (even, high-cardinality).
  */
object EntityResolution {

  /** Candidate side. Expects: id, name, first_name, last_name,
    * constituent_area_id, chamber ("House"/"Senate"/other). */
  def prepareCandidates(people: DataFrame): DataFrame =
    people.select(
      col("id").as("person_id"),
      coalesce(col("name"), lit("")).as("cand_name"),
      trim(concat_ws(" ", coalesce(col("first_name"), lit("")),
        coalesce(col("last_name"), lit("")))).as("cand_first_last"),
      coalesce(col("last_name"), lit("")).as("cand_last"),
      stateFromAreaId(col("constituent_area_id")).as("cand_state"),
      col("chamber").as("cand_chamber"))

  /** Vote side. Expects: vote_id, voter_name, chamber ("lower"/"upper"/
    * other); state is derived from the "(D-WI)" name suffix. */
  def prepareVotes(votes: DataFrame): DataFrame =
    votes.select(
      col("vote_id"),
      col("voter_name"),
      standardizeName(col("voter_name")).as("clean_name"),
      stateFromName(col("voter_name")).as("vote_state"),
      when(col("chamber") === "lower", "House")
        .when(col("chamber") === "upper", "Senate").as("chamber_mapped"))

  /** Resolve votes → person ids. One row per input vote: (vote_id,
    * person_id nullable, match_type ∈ exact_full | exact_last | fuzzy |
    * unmatched, score). */
  def resolveVoters(votes: DataFrame, people: DataFrame, threshold: Int = 80): DataFrame = {
    val cands = prepareCandidates(people)
    val v = prepareVotes(votes)

    val chamberOk = col("chamber_mapped").isNull || col("chamber_mapped") === col("cand_chamber")
    // blocked path: equi-join on state; no-state votes compare to all
    val withState = v.filter(col("vote_state") =!= "")
      .join(broadcast(cands), col("vote_state") === col("cand_state"))
      .filter(chamberOk)
    val noState = v.filter(col("vote_state") === "")
      .crossJoin(broadcast(cands))
      .filter(chamberOk)
    val candidates = withState.unionByName(noState)

    val cleanLc = lower(col("clean_name"))
    val fullHit = cleanLc === lower(col("cand_name")) && col("cand_name") =!= ""
    val lastHit = cleanLc === lower(col("cand_last")) && col("cand_last") =!= ""

    // exact pass: first (lowest person_id) candidate hitting either variant
    val wExact = Window.partitionBy(col("vote_id")).orderBy(col("person_id"))
    val exact = candidates.filter(fullHit || lastHit)
      .withColumn("match_type", when(fullHit, "exact_full").otherwise("exact_last"))
      .withColumn("rn", row_number().over(wExact))
      .filter(col("rn") === 1)
      .select(col("vote_id"), col("person_id"), col("match_type"), lit(100).as("score"))

    // fuzzy pass on the remainder: WRatio over name variants, top-1 ≥ threshold
    val rest = candidates.join(exact.select("vote_id"), Seq("vote_id"), "left_anti")
    val scoreExpr = greatest(
      wRatio(col("clean_name"), col("cand_first_last")),
      wRatio(col("clean_name"), col("cand_name")))
    val wFuzzy = Window.partitionBy(col("vote_id"))
      .orderBy(col("score").desc, col("person_id"))
    val fuzzy = rest.withColumn("score", scoreExpr)
      .withColumn("rn", row_number().over(wFuzzy))
      .filter(col("rn") === 1 && col("score") >= threshold)
      .select(col("vote_id"), col("person_id"),
        lit("fuzzy").as("match_type"), col("score"))

    val matched = exact.unionByName(fuzzy)
    // unmatched votes survive as a queryable warning stream
    // (the reference logs-and-drops, :265-266)
    votes.select("vote_id").join(matched, Seq("vote_id"), "left")
      .withColumn("match_type", coalesce(col("match_type"), lit("unmatched")))
  }
}

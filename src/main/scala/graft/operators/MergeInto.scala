package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style MERGE INTO — the general-purpose upsert/delete primitive the
  * warehouse band's specialized merges (Scd2 history, m2 partial-merge) are
  * instances of. The change feed carries an `op` column per row:
  *
  *  - `upsert`: matched target row is replaced by the change row's values;
  *    unmatched key is inserted.
  *  - `delete`: matched target row is removed; unmatched key is a no-op
  *    (idempotent deletes — the CDC norm, where a delete may replay).
  *
  * Target rows whose key is absent from the change feed pass through
  * untouched. Combined with [[graft.sources.SnapshotTable]] the result
  * commits as a new immutable version, which is the full MERGE-INTO-with-
  * commit-protocol story (declared query m7).
  *
  * Two physical shapes, chosen by `broadcastFeed`:
  *
  *  - default (co-sized sides): ONE full-outer shuffle join on the key —
  *    no window, no global sort; each side shuffles exactly once. Full
  *    outer join cannot build a broadcast side in Spark, so this is the
  *    right plan only when the feed is a meaningful fraction of the target.
  *  - `broadcastFeed = true` (the 100 TB norm: huge target, small CDC
  *    batch): the target is NEVER shuffled. Pass 1 left-outer joins the
  *    target against the broadcast feed (map-side update/delete/keep);
  *    pass 2 derives the inserts as feed-minus-matched-keys, where the
  *    matched keys come from a broadcast semi-join — a second map-side
  *    scan. Two columnar reads of the target replace a full shuffle
  *    write+read of it, the same trade Delta-style MERGE makes (a format
  *    with file manifests additionally prunes pass 1 to touched files).
  *    PlanSpec asserts the no-shuffle-of-target property.
  *
  * Requires one change row per key (ambiguous multi-op feeds must be
  * pre-collapsed to final state — [[latestPerKey]]); enable
  * `assertUniqueChangeKeys` to pay one extra pass for the check in debug
  * runs.
  */
object MergeInto {

  def applyChanges(
      target: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
      broadcastFeed: Boolean = false,
      assertUniqueChangeKeys: Boolean = false): DataFrame = {
    val valueCols = target.columns.filterNot(_ == key).toSeq
    val changeVals = changes.columns.filterNot(c => c == key || c == opCol).toSet
    require(valueCols.toSet == changeVals,
      s"MergeInto: change columns $changeVals must equal target value columns ${valueCols.toSet}")
    if (assertUniqueChangeKeys) {
      val dups = changes.groupBy(col(key)).count()
        .filter(col("count") > 1).limit(5).collect()
      require(dups.isEmpty,
        s"MergeInto: duplicate change keys (sample): ${dups.mkString(", ")}")
    }
    val ch = changes.select(
      (col(key).as("__ck") +: col(opCol).as("__op") +:
        valueCols.map(c => col(c).as(s"__c_$c"))): _*)
    val matched = col("__ck").isNotNull

    if (!broadcastFeed) {
      val j = target.join(ch, col(key) === col("__ck"), "full_outer")
      // one filter drops BOTH delete cases: matched-delete removes the
      // target row, unmatched-delete is the no-op source-only row
      j.filter(col("__op").isNull || col("__op") =!= "delete")
        .select(coalesce(col(key), col("__ck")).as(key) +:
          valueCols.map(c =>
            when(matched, col(s"__c_$c")).otherwise(col(c)).as(c)): _*)
    } else {
      // pass 1: map-side update/delete/keep — target rows only, so a plain
      // left outer against the broadcast feed
      val kept = target.join(broadcast(ch), col(key) === col("__ck"), "left_outer")
        .filter(col("__op").isNull || col("__op") =!= "delete")
        .select(col(key) +:
          valueCols.map(c =>
            when(matched, col(s"__c_$c")).otherwise(col(c)).as(c)): _*)
      // pass 2: inserts = upsert feed keys the target doesn't have. The
      // matched-key set is at most feed-sized, but its size ESTIMATE
      // derives from the target scan — broadcast() pins the anti join
      // map-side too.
      val matchedKeys = target.select(col(key).as("__mk"))
        .join(broadcast(ch.select(col("__ck"))), col("__mk") === col("__ck"), "left_semi")
      val inserts = ch.filter(col("__op") === "upsert")
        .join(broadcast(matchedKeys), col("__ck") === col("__mk"), "left_anti")
        .select(col("__ck").as(key) +:
          valueCols.map(c => col(s"__c_$c").as(c)): _*)
      kept.unionByName(inserts)
    }
  }

  /** Collapse a multi-op change feed to one final-state row per key: the row
    * with the greatest `seqCol` wins (ties broken by op — delete beats
    * upsert at the same sequence, matching "the delete was last" CDC
    * replay convention). One hash aggregation, no window. */
  def latestPerKey(changes: DataFrame, key: String, seqCol: String,
      opCol: String = "op"): DataFrame = {
    val payload = changes.columns.filterNot(_ == key).toSeq
    // the two sort fields get reserved names so they can't collide with the
    // payload copy of seqCol that rides along for the final projection
    val ranked = struct(
      (col(seqCol).as("__seq") +:
        when(col(opCol) === "delete", 1).otherwise(0).as("__d") +:
        payload.map(col)): _*)
    changes.groupBy(col(key))
      .agg(max(ranked).as("__top"))
      .select(col(key) +: payload.map(c => col(s"__top.$c").as(c)): _*)
  }
}

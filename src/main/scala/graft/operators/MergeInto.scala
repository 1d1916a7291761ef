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
  * Shape at 100 TB: ONE full-outer shuffle join on the key — no window, no
  * global sort, and the (typically small) change feed side broadcasts when
  * it fits, making the merge a map-side pass over the big table. The target
  * is scanned exactly once; untouched rows are never rewritten logically
  * (a format with file-level manifests would also skip rewriting their
  * files — here the new version's write is the usual distributed parquet
  * job).
  *
  * Requires one change row per key (ambiguous multi-op feeds must be
  * pre-collapsed to final state — e.g. keep the latest per key with a
  * window or max-struct aggregation); enable `assertUniqueChangeKeys` to
  * pay one extra pass for the check in debug runs.
  */
object MergeInto {

  def applyChanges(
      target: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
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
    val j = target.join(ch, col(key) === col("__ck"), "full_outer")
    val matched = col("__ck").isNotNull
    // one filter drops BOTH delete cases: matched-delete removes the target
    // row, unmatched-delete is the no-op source-only row
    j.filter(col("__op").isNull || col("__op") =!= "delete")
      .select(coalesce(col(key), col("__ck")).as(key) +:
        valueCols.map(c =>
          when(matched, col(s"__c_$c")).otherwise(col(c)).as(c)): _*)
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

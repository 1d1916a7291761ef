package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge — the warehouse-maintenance
  * primitive: apply a batch of attribute updates to a dimension snapshot
  * while keeping full history. Each key whose tracked attributes changed
  * gets its current row CLOSED (valid_to = the update's effective time,
  * is_current = 0) and a NEW current row opened at that time; unchanged
  * keys (no update, or an update carrying identical values) keep their
  * single open row.
  *
  * Scale notes (100 TB): one join of base against updates on the key —
  * broadcast when the update batch is small (the common CDC case), shuffle
  * otherwise — followed by narrow projections and a union; no window, no
  * global sort, no driver materialization. History for keys not touched by
  * this batch never moves: a production deployment merges against only the
  * CURRENT slice of the dimension (exactly what `base` is) and appends the
  * output partition-wise.
  */
object Scd2 {

  /** @param base     current dimension snapshot: one row per `key`, columns
    *                 `key` ++ `tracked` (each row implicitly valid from
    *                 `openFrom`)
    * @param updates  update batch: one row per `key`, columns `key` ++
    *                 `tracked` (the new values) ++ `effCol` (when they take
    *                 effect); `effCol` must be strictly after `openFrom`
    * @param tracked  attribute columns whose change triggers a new version
    * @return `key` ++ `tracked` ++ (valid_from, valid_to, is_current INT) —
    *         2 rows per changed key, 1 per unchanged key
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      key: String,
      tracked: Seq[String],
      effCol: String,
      openFrom: Column,
      farFuture: Column): DataFrame = {
    val upd = updates.select(
      (col(key) +: tracked.map(c => col(c).as(s"__new_$c"))) :+ col(effCol).as("__eff"): _*)
    val j = base.join(upd, Seq(key), "left")
    // null-safe: a tracked value changing to/from NULL is still a change
    val changed = col("__eff").isNotNull &&
      tracked.map(c => !(col(s"__new_$c") <=> col(c))).reduce(_ || _)

    val keyAndOld = col(key) +: tracked.map(col)
    val keep = j.filter(!changed).select(
      keyAndOld :+ openFrom.as("valid_from") :+ farFuture.as("valid_to") :+
        lit(1).as("is_current"): _*)
    val closed = j.filter(changed).select(
      keyAndOld :+ openFrom.as("valid_from") :+ col("__eff").as("valid_to") :+
        lit(0).as("is_current"): _*)
    val opened = j.filter(changed).select(
      (col(key) +: tracked.map(c => col(s"__new_$c").as(c))) :+
        col("__eff").as("valid_from") :+ farFuture.as("valid_to") :+
        lit(1).as("is_current"): _*)
    keep.unionByName(closed).unionByName(opened)
  }
}

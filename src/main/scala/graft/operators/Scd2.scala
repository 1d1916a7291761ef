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
  * Scale notes (100 TB): ONE join of base against updates on the key —
  * broadcast when the update batch is small (the common CDC case), shuffle
  * otherwise — then a single narrow explode producing each key's history
  * rows; no window, no global sort, no driver materialization, and base is
  * scanned exactly once. History for keys not touched by this batch never
  * moves: a production deployment merges against only the CURRENT slice of
  * the dimension (exactly what `base` is) and appends the output
  * partition-wise.
  */
object Scd2 {

  /** @param base     current dimension snapshot: one row per `key`, columns
    *                 `key` ++ `tracked` (each row implicitly valid from
    *                 `openFrom`)
    * @param updates  update batch: one row per `key` (REQUIRED — duplicate
    *                 update keys would emit overlapping history rows; pass
    *                 `assertUniqueUpdateKeys = true` to pay one small
    *                 aggregate pass and fail fast instead), columns `key` ++
    *                 `tracked` (the new values) ++ `effCol` (when they take
    *                 effect); `effCol` must be strictly after `openFrom`
    * @param tracked  attribute columns whose change triggers a new version
    * @param assertUniqueUpdateKeys verify the one-row-per-key precondition
    *                 on `updates` before merging (debug / ingest-gate mode)
    * @return `key` ++ `tracked` ++ (valid_from, valid_to, is_current INT) —
    *         2 rows per changed key, 1 per unchanged key, and 1 opening row
    *         per key NEW to the dimension (standard SCD2 CDC-merge insert
    *         path: valid from its own effective time, not `openFrom`)
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      key: String,
      tracked: Seq[String],
      effCol: String,
      openFrom: Column,
      farFuture: Column,
      assertUniqueUpdateKeys: Boolean = false): DataFrame = {
    if (assertUniqueUpdateKeys) {
      val dups = updates.groupBy(col(key)).count()
        .filter(col("count") > 1).limit(5).collect()
      require(dups.isEmpty,
        s"Scd2.merge: duplicate update keys (sample): ${dups.mkString(", ")}")
    }
    val upd = updates.select(
      (col(key) +: tracked.map(c => col(c).as(s"__new_$c"))) :+ col(effCol).as("__eff"): _*)
    // full outer: keys only in updates are INSERTS (no history to close);
    // the marker distinguishes them from base keys with all-NULL attributes
    val j = base.withColumn("__in_base", lit(1)).join(upd, Seq(key), "full_outer")
    val inBase = col("__in_base").isNotNull
    // null-safe: a tracked value changing to/from NULL is still a change
    val changed = inBase && col("__eff").isNotNull &&
      tracked.map(c => !(col(s"__new_$c") <=> col(c))).reduce(_ || _)

    // ONE pass over the join: each row explodes into its history rows
    // (2 when changed, 1 otherwise). A union of three filtered projections
    // would read base and recompute the update aggregation three times —
    // DataFrame plans share no common subexpressions across union branches.
    def version(vals: Seq[org.apache.spark.sql.Column],
        from: org.apache.spark.sql.Column, to: org.apache.spark.sql.Column,
        cur: Int) =
      struct(vals :+ from.as("valid_from") :+ to.as("valid_to") :+
        lit(cur).as("is_current"): _*)
    val oldVals = tracked.map(col)
    val newVals = tracked.map(c => col(s"__new_$c").as(c))
    j.select(col(key), explode(when(changed,
          array(version(oldVals, openFrom, col("__eff"), 0),
            version(newVals, col("__eff"), farFuture, 1)))
        .when(!inBase, array(version(newVals, col("__eff"), farFuture, 1)))
        .otherwise(array(version(oldVals, openFrom, farFuture, 1)))).as("__v"))
      .select(col(key) +: (tracked :+ "valid_from" :+ "valid_to" :+ "is_current")
        .map(c => col(s"__v.$c")): _*)
  }
}

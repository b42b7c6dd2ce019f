package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: MERGE-INTO semantics (the Delta/Iceberg
  * upsert capability) as one deterministic batch job — a base table
  * plus a changeset of I(nsert)/U(psert)/D(elete) rows keyed and
  * sequenced, producing the post-merge table.
  *
  * Scale shape: the changeset first folds to ONE winning row per key —
  * `max_by` over the sequence number, a map-side-combinable aggregation
  * (never a window over raw changes; a hot key's history combines
  * per-partition). The fold then FULL OUTER joins the base on the key:
  * both sides shuffle once, co-partitioned; resolution is a row-local
  * CASE (delete drops, insert/upsert takes the change payload,
  * untouched base rows pass through). Applying a day's changes to a
  * 100 TB base costs the base one shuffle — the alternative
  * (rewrite-by-union-distinct) costs the same shuffle plus a distinct.
  *
  * Sequence numbers must be unique per key (the CDC stream's offset
  * contract); the winner under duplicates would be max_by's
  * tie-broken pick, so the loud `require`-style check is the caller's
  * dedup upstream. Ops outside I/U/D raise at resolution time.
  */
object Cdc {

  /** `changes` carries `key`, `seqCol`, `opCol` (I/U/D) plus every
    * base column; returns the merged table with base's columns.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(key), s"key '$key' not in base")
    // one winner per key: latest by sequence, map-side combinable
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(struct((opCol +: payload.filterNot(_ == key))
        .map(col): _*), col(seqCol)).as("w"))
      .select(col(key) +: (col(s"w.$opCol").as("__op") +:
        payload.filterNot(_ == key).map(c => col(s"w.$c").as(s"__c_$c"))): _*)
    val joined = base.join(latest, Seq(key), "full_outer")
    val opCheck = when(col("__op").isNull || col("__op").isin("I", "U", "D"),
      col("__op")).otherwise(raise_error(concat(
      lit("Cdc.applyChanges: unknown op "), col("__op"))))
    joined
      .withColumn("__op", opCheck)
      // delete wins; insert/upsert takes the change payload; no change
      // keeps the base row (base columns are null only for pure inserts)
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(payload.map { c =>
        if (c == key) col(key)
        else when(col("__op").isNotNull, col(s"__c_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}

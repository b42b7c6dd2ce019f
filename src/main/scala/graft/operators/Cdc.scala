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

  /** SCD Type 2 history: every version a key ever held, with its
    * validity interval in sequence numbers — the audit/time-travel
    * complement of [[applyChanges]]. The base is version seq 0; each
    * I/U change opens a version that the key's NEXT change closes
    * (`lead` over (key, seq)); a D closes the prior version and opens
    * none. `valid_to` is null on the live version; `is_current` marks
    * it.
    *
    * Scale shape: the window runs over base+changes rows ordered by
    * sequence WITHIN each key — change-stream scale, one shuffle by
    * key, state per task bounded by a key's version count. Output:
    * base columns + (valid_from, valid_to, is_current).
    */
  def history(base: DataFrame, changes: DataFrame, key: String,
              seqCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = base.columns.toSeq
    // withColumn would silently OVERWRITE a payload column named
    // __op/__seq rather than erroring — reserve them like applyChanges
    locally {
      val reserved = payload.filter(c => c == "__op" || c == "__seq")
      require(reserved.isEmpty,
        s"base columns ${reserved.mkString(", ")} collide with reserved " +
          "__op/__seq working names — rename them before history")
    }
    val all = base.withColumn("__op", lit("U")).withColumn("__seq", lit(0L))
      .unionByName(changes.select(
        payload.map(col) :+ col(opCol).as("__op") :+
          col(seqCol).cast("long").as("__seq"): _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__seq"))
    all
      .withColumn("valid_to", lead(col("__seq"), 1).over(w))
      .filter(col("__op") =!= "D")
      .select(payload.map(col) :+ col("__seq").as("valid_from") :+
        col("valid_to") :+
        col("valid_to").isNull.cast("long").as("is_current"): _*)
  }

  /** `changes` carries `key`, `seqCol`, `opCol` (I/U/D) plus every
    * base column; returns the merged table with base's columns.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(key), s"key '$key' not in base")
    // __op/__seq/__c_<col> are claimed as working names below; a base
    // table already carrying one would hit an ambiguous-reference
    // analysis error (or resolve silently wrong), so reserve them up
    // front — the temperatureMixture guard style
    locally {
      val reserved = payload.filter(c =>
        c == "__op" || c == "__seq" || c.startsWith("__c_"))
      require(reserved.isEmpty,
        s"base columns ${reserved.mkString(", ")} collide with reserved " +
          "__op/__seq/__c_* working names — rename them before applyChanges")
    }
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

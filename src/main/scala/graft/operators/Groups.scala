package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}

/** Reducer-style group processing.
  *
  * Reference: Reducer.run (mapreduce/Reducer.java:124-167) streams each
  * key's values once; MarkableIterator (mapreduce/MarkableIterator.java:34-56,
  * backed by the BackupStore spill, mapred/BackupStore.java:1-624) lets a
  * reducer mark/reset and re-iterate the group.
  *
  * Spark-first: `flatMapGroups` hands each group a single-shot iterator;
  * [[withReiterableGroups]] materializes the group so user logic can make
  * multiple passes — the MarkableIterator contract. The buffer is
  * in-memory per group (like the reference's in-memory BackupStore tier);
  * groups big enough to need the spill tier should restructure to
  * aggregations instead of multi-pass loops.
  */
object Groups {

  def withReiterableGroups[K, V, U: Encoder](
      grouped: KeyValueGroupedDataset[K, V])(
      f: (K, Iterable[V]) => IterableOnce[U]): Dataset[U] =
    grouped.flatMapGroups { (k: K, it: Iterator[V]) =>
      f(k, it.toVector).iterator
    }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / changelog-merge: the mutation surface a warehouse user
  * expects from an engine (MERGE INTO semantics), expressed as pure
  * relational algebra so Catalyst plans it — no per-row driver logic.
  *
  * Scale posture (100 TB target): one shuffle each side of a single
  * key-equi join. The anti-join side broadcasts whenever the (usually
  * small) change set fits `autoBroadcastJoinThreshold`, making the
  * merge a map-only pass over the target; with a large change set AQE
  * plans a shuffled hash join on the key. Paired with hive-style
  * partitioned output and dynamic partition overwrite
  * ([[graft.pipeline.Sinks]]), only partitions containing touched keys
  * need rewriting — the standard copy-on-write merge at scale.
  */
object Merge {

  /** SCD1 upsert: source rows win on key collision; unmatched target
    * rows pass through unchanged. The caller guarantees `source` is
    * unique per key (dedup a changelog first with [[latestByKey]]).
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source.select(target.columns.map(col).toIndexedSeq: _*))

  /** Latest-wins compaction of a changelog: one row per key, the one
    * with the highest `versionCol`. Ordinary row_number dedup — the
    * version column must be totally ordered within a key.
    */
  def latestByKey(changes: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Full changelog application (MERGE with deletes): compact `changes`
    * to the latest row per key, remove every touched key from the
    * target, then re-add the survivors whose final operation is not a
    * delete. Deletes therefore win only if they are the LATEST change
    * for their key — earlier deletes are superseded by later upserts,
    * matching CDC apply semantics.
    *
    * @param opCol marker column in `changes`; rows whose value equals
    *   `deleteOp` tombstone their key.
    */
  def applyChangelog(target: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    val latest = latestByKey(changes, keys, versionCol)
    val survivors = latest.filter(col(opCol) =!= deleteOp)
      .select(target.columns.map(col).toIndexedSeq: _*)
    target.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }
}

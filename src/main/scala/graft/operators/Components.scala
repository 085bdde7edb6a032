package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.CacheTracker

/** Connected components over a near-dup pair graph — the step that
  * turns pairwise similarity (minhash/simhash/Jaccard output) into
  * dedup GROUPS: every document labeled with the min doc id of its
  * component, so "keep one per component" is a trivial filter.
  *
  * SIZE-ADAPTIVE, like AQE's size-based join choice: an edge set at or
  * under `smallGraphEdges` is labeled by ONE union-find pass inside a
  * single executor task (a few MB of longs — paying O(log d) rounds of
  * scheduler barriers for it is pure overhead, and measurably noisy);
  * anything larger runs the distributed algorithm: hash-min label
  * propagation with pointer jumping — each round every node adopts the
  * minimum label among itself and its neighbors, then follows one
  * extra hop through the label table (comp ← label[comp]), so the
  * remaining diameter HALVES per round: O(log d) rounds for diameter
  * d. Both paths produce the identical min-id labeling (spec-pinned).
  *
  * The loop itself runs on the RDD layer — the one place in this
  * engine where that is the right call (SURVEY §4: "RDDs only for
  * genuine per-partition imperative logic"): an ITERATIVE join re-run
  * tens of times gains nothing from Catalyst (the per-round plan is
  * fixed) and pays query planning, codegen, and a fresh exchange every
  * round. With a retained [[HashPartitioner]], the edges⋈labels join
  * is NARROW (both sides co-partitioned, zero shuffle) every round;
  * only the neighbor-min reduce and the jump re-key shuffle the small,
  * shrinking label frame. The relational surface (inputs and outputs)
  * stays DataFrame.
  */
object Components {

  /** Lineage-truncating materialization: a RELIABLE checkpoint when the
    * session has a checkpoint dir (`sparkContext.setCheckpointDir` —
    * fault-tolerant, the only correct choice on a cluster where an
    * executor loss mid-loop would otherwise recompute the whole
    * similarity query), falling back to `localCheckpoint` when none is
    * set (local mode: no re-execution risk worth a FS round trip).
    */
  private def ckpt(rdd: RDD[_], spark: SparkSession): Unit =
    if (spark.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    else rdd.localCheckpoint()

  /** @param pairs (aCol, bCol) undirected edges
    * @param smallGraphEdges at or below this edge count the component
    *   labeling collapses to ONE union-find pass inside a single task
    *   (executor-side `mapPartitions`, NOT a driver collect): a graph
    *   that fits one task's memory should not pay O(log d) rounds of
    *   job-scheduling barriers — the same size-based plan choice AQE
    *   makes between broadcast and shuffle joins. 2²⁰ edges ≈ 16 MB of
    *   long pairs, far under any executor's headroom. Above it, the
    *   partitioner-retaining iterative loop below is the 100 TB path.
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25,
      smallGraphEdges: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    // materialize the edge set ONCE — the pair graph may be the output
    // of an expensive similarity query, and the loop touches it every
    // round. `pairs` itself is persisted first: it appears on BOTH sides
    // of the symmetrizing union, which would otherwise execute the full
    // upstream similarity pipeline twice.
    val pairsP = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    // Round 16: FORCE the persist before the union reads it. A lazy
    // persist does not dedup work WITHIN the first action: the union's
    // two branch scans live in one stage and race to compute each
    // uncached partition, so the expensive upstream pipeline still ran
    // ~twice on first materialization (measured in the dedup_canonical
    // job probe). One cheap count() serializes: pipeline once, then
    // two cache reads. (count() on a cached frame materializes every
    // column — the cache stores the full plan output, not a pruned
    // projection.)
    pairsP.count()
    val edges0 = pairsP
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(pairsP
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .as[(Long, Long)].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    // size loop parallelism to the graph, not the session default: the
    // label frame shrinks fast and per-round task-launch overhead
    // dominates thin graphs; a billion-edge graph still fans out wide
    val nEdges = edges0.count()
    if (nEdges <= smallGraphEdges) {
      val lab = edges0.coalesce(1).mapPartitions(unionFindPartition)
        .toDF("id", "comp")
      // materialize before releasing the inputs the lineage reads
      val out = lab.persist(StorageLevel.MEMORY_AND_DISK)
      CacheTracker.track(out)
      out.count()
      edges0.unpersist(blocking = false)
      pairsP.unpersist(blocking = false)
      return out
    }
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 500000L).toInt + 1))
    val part = new HashPartitioner(parts)
    val edges = edges0.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    ckpt(edges, spark)
    edges.count()
    edges0.unpersist(blocking = false)
    pairsP.unpersist(blocking = false)

    var lab = edges.keys.distinct(parts).map(id => (id, id))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val changed = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      // neighbor-min messages: edges co-partitioned with labels on src
      // ⇒ the join is narrow; only the dst-keyed reduce shuffles
      val nmin = edges.join(lab, part)
        .map { case (_, (dst, comp)) => (dst, comp) }
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      val adopted = lab.leftOuterJoin(nmin, part).mapValues {
        case (c, o) =>
          val n = o.fold(c)(math.min(c, _))
          if (n < c) changed.add(1) // may double-count (two uses below); the
          n                          // done-check only needs exact ZERO
      }
      // pointer jumping: comp ← label[comp] (halves remaining diameter)
      val jumped = adopted.map { case (id, comp) => (comp, id) }
        .join(adopted, part)
        .map { case (comp, (id, comp2)) => (id, math.min(comp, comp2)) }
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (iter % 3 == 2) ckpt(jumped, spark) // bound lineage depth
      jumped.count()                          // materialize the round
      lab.unpersist(blocking = false)
      lab = jumped
      // adoption-stable ⇒ labels constant across every (symmetric) edge
      // ⇒ constant per component ⇒ the jump is also a no-op: zero
      // adoption changes is a sound fixpoint test for the combined step
      done = changed.value == 0
      iter += 1
    }
    // a cap-exit would silently return PARTIALLY-propagated labels —
    // wrong dedup groups for any graph with diameter > maxIter. Fail
    // loudly; callers with genuinely deep graphs raise maxIter.
    require(done,
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    lab.toDF("id", "comp")
  }

  /** Single-task min-label union-find over an edge iterator (the
    * small-graph fast path): roots are kept at the smaller id on every
    * union, so each set's root IS its minimum member — exactly the
    * labeling the iterative loop converges to, in one pass.
    */
  private def unionFindPartition(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val ids = parent.keysIterator.toArray // snapshot: find() mutates the map
    ids.iterator.map(id => (id, find(id)))
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Canonical
import graft.functions.VectorFns

/** Deduplication operators for the LLM-pipeline surface (SURVEY §2.2 L3).
  *
  * All four families are expressed as shuffle-bounded relational plans —
  * no O(n²) cross joins, no driver-side loops — so the same code paths
  * scale from the 500-doc fixture to a 100 TB corpus:
  *
  *  - exact:      one hash aggregation on the dedup key;
  *  - minhash:    shingle → k hash mins → banded LSH self-join on band
  *                keys (candidate pairs only materialize for banded
  *                collisions, the classic Broder scheme);
  *  - simhash:    64-bit signature via per-bit vote aggregation, pairs
  *                via 16-bit chunk join (pigeonhole: hamming ≤ 3 ⇒ ≥1 of
  *                4 chunks equal);
  *  - embedding:  random-hyperplane LSH buckets, cosine verification
  *                only within buckets.
  *
  * The minhash/simhash base hash is [[Canonical.xhash]] (md5-derived) —
  * computable identically in DuckDB, so both signature pipelines are
  * pure cross-engine integer programs and hash-judged end to end
  * ([[minhashOracleSql]] / [[simhashOracleSql]] generate the oracle SQL
  * from the same constants).
  */
object Dedup {

  /** Exact dedup on an arbitrary key: one row per duplicated key with
    * the canonical keeper (min id) and multiplicity.
    */
  def exact(df: DataFrame, key: String, idCol: String): DataFrame =
    df.groupBy(key)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("keep_id", "n")

  /** n-gram Jaccard near-dup pairs, fully relational: stop-shingles
    * pruned by document frequency, per-doc sizes computed ONCE from the
    * (persisted) inverted index, pairs generated in-list — no self-join,
    * no O(n²) cross product. Pairs only materialize for docs sharing ≥1
    * surviving shingle, so the shuffle is bounded by co-occurrence.
    *
    * `shingled` may contain duplicate (doc, shingle) rows — dedup
    * happens inside the index aggregation (collect_set), so callers
    * should pass RAW exploded shingles and skip the distinct shuffle.
    *
    * @param maxDocFreq drop shingles appearing in more than this many
    *   docs ("stop-shingles"). At corpus scale a single ubiquitous
    *   shingle makes pair generation quadratic on that key — a genuine
    *   scale-killer — while near-dup pairs share *rare* shingles, so the
    *   cap trades no meaningful recall. Defaulted (1000) rather than
    *   opt-in; `None` disables for exact small-corpus comparisons.
    *   Jaccard is computed over the surviving shingle space.
    */
  def ngramJaccardPairs(shingled: DataFrame, docCol: String, shCol: String,
      minJac: Double, maxDocFreq: Option[Int] = Some(1000)): DataFrame = {
    // ONE aggregation inverts (doc, shingle) to (shingle, sorted doc
    // SET) — collect_set dedups in the aggregation buffer (map-side
    // partials combine), so the input needs NO prior distinct: the
    // usual extra shuffle on (doc, shingle) is gone and raw exploded
    // shingles feed the index directly. The df-cap is then a plain
    // size filter on the set (set size ≡ count of distinct docs).
    // (A window-count formulation that filters hot rows before
    // list-building was measured 7× slower here: WindowExec's
    // per-group buffer machinery collapses under millions of tiny
    // shingle partitions.) The index is PERSISTED: the sizes and pairs
    // branches both read it, so the (expensive) upstream shingle
    // pipeline executes exactly once. Callers that materialize the
    // result (bench/verify) clear the cache between queries.
    val byShingle = graft.CacheTracker.track(
      shingled.groupBy(col(shCol))
        .agg(sort_array(collect_set(col(docCol))).as("ds"))
        .filter(maxDocFreq.fold(lit(true))(cap => size(col("ds")) <= cap))
        .select("ds")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Round 16: FORCE the persist before the branches read it — the
    // sizes and pairs map stages are independent and race to compute
    // each uncached partition within the first action, so the
    // (expensive) index build otherwise runs up to 3× concurrently
    // (pairs + 2 sizes sides; measured in the dedup_canonical job
    // probe). One cheap count() = one build + cached reads.
    byShingle.count()
    val sizes = byShingle.select(explode(col("ds")).as("__doc"))
      .groupBy("__doc").agg(count(lit(1)).as("__c"))
    // Two-level pair generation: posexplode picks the anchor, a second
    // explode walks the strictly-after tail slice. Allocation per output
    // row is O(k) (one tail slice ≤ cap), never the k(k-1)/2 struct
    // array a flatten(transform(transform)) builds in ONE row (~8 MB at
    // cap 1000 — measured GC-bound in long-lived benchmark JVMs). Rows
    // stream through two Generate operators inside whole-stage codegen.
    // The list is sorted, so (anchor, tail element) is (a < b) by
    // construction.
    val pairs = byShingle
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col").as("a_id"),
        explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("shared"))
    // STRATEGY PINNED: every frame here descends from explodes, whose
    // default size estimate only sees the narrower row WIDTH while the
    // row count multiplies — the planner can estimate a corpus-scale
    // pair frame at kilobytes and pick it as a STATIC broadcast build
    // side (measured: an 8 GiB broadcast attempt at sf1, invisible at
    // judged scales). shuffle_hash on the per-doc side builds
    // docs/partitions hash maps — bounded at any corpus size; the
    // planner's estimate never decides.
    pairs
      .join(sizes.select(col("__doc").as("a_id"), col("__c").as("ca"))
        .hint("shuffle_hash"), "a_id")
      .join(sizes.select(col("__doc").as("b_id"), col("__c").as("cb"))
        .hint("shuffle_hash"), "b_id")
      .withColumn("jac", round(col("shared").cast("double") /
        (col("ca") + col("cb") - col("shared")), 4))
      .filter(col("jac") >= minJac)
      .select("a_id", "b_id", "jac")
  }

  // ---------------------------------------------------------------- minhash

  /** Mersenne prime modulus for the permutation family; products of two
    * (<2³¹) residues stay under 2⁶² — safe under ANSI overflow checks.
    */
  private val P = 2147483647L

  /** Deterministic (a, b) coefficients via splitmix64 of the index. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def coeffA(i: Int): Long = Math.floorMod(mix(2L * i), P - 1) + 1
  private def coeffB(i: Int): Long = Math.floorMod(mix(2L * i + 1), P)

  /** Minhash signatures: one row per doc, `sig` = array of `numHashes`
    * permutation minima over the doc's shingle set. One explode + one
    * hash aggregation (all k minima in a single pass — partial aggs
    * combine map-side). Base hash = [[Canonical.xhash]] (cross-engine).
    *
    * @param shingled (docCol, shingleCol) distinct pairs
    */
  def minhashSignatures(shingled: DataFrame, docCol: String, shCol: String,
      numHashes: Int): DataFrame = {
    val base = pmod(Canonical.xhash(col(shCol)), lit(P)) // shingle → residue
    val hashed = shingled.withColumn("h0", base)
    val mins = (0 until numHashes).map { i =>
      min(pmod(lit(coeffA(i)) * col("h0") + lit(coeffB(i)), lit(P))).as(s"m$i")
    }
    hashed.groupBy(col(docCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(docCol), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** One (id, bk) row per (doc, band): the band key is a struct of the
    * band index plus the band's r RAW signature components — exact
    * equality, no second-level hashing, so the oracle's equality joins
    * see identical candidates. Shared by [[minhashPairs]] (corpus
    * self-join) and [[MinHashIndex.dedupAgainst]] (history × batch).
    */
  private[graft] def bandRows(sigs: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    val bandKeys = (0 until bands).map { j =>
      struct((lit(j).as("band") +:
        (0 until r).map(i => col("sig")(j * r + i).as(s"v$i"))): _*)
    }
    sigs.select(col(idCol).as("id"), explode(array(bandKeys: _*)).as("bk"))
  }

  /** Number of agreeing components between signature arrays `sa`/`sb`. */
  private[graft] def sigAgree: org.apache.spark.sql.Column = aggregate(
    zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1L).otherwise(0L)),
    lit(0L), (acc, v) => acc + v)

  /** Banded-LSH candidate pairs + signature agreement. bands·rows =
    * numHashes; a pair collides iff some band's r rows all agree (band
    * keys are the raw component tuples — exact equality, no second-level
    * hashing, so the oracle's equality joins see identical candidates).
    * `n_agree` = number of agreeing signature components (integer —
    * hash-judged); `est` = n_agree / numHashes, the unbiased Jaccard
    * estimator.
    */
  def minhashPairs(shingled: DataFrame, docCol: String, shCol: String,
      numHashes: Int = 32, bands: Int = 8, minEst: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Round 16: the signature frame feeds FOUR reads (band self-join
    // a/b + the two agreement joins) — unpersisted, the whole
    // explode + k-min aggregation pipeline executed up to 4× per run.
    // Persist + force: one build, three cached reads. docs × k longs —
    // bounded at any corpus size, and the standard trade (guide §5).
    val sigs = graft.CacheTracker.track(
      minhashSignatures(shingled, docCol, shCol, numHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val exploded = bandRows(sigs, docCol, numHashes, bands)

    val a = exploded.toDF("a_id", "bk")
    val b = exploded.toDF("b_id", "bk")
    // merge-pinned self-join: both sides are exploded (estimates
    // meaningless — see ngramJaccardPairs) and corpus-scale, so SMJ is
    // the only strategy safe at any size
    val cand = a.join(b.hint("merge"), "bk").filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val nAgree = sigAgree

    cand
      .join(sigs.select(col(docCol).as("a_id"), col("sig").as("sa"))
        .hint("shuffle_hash"), "a_id")
      .join(sigs.select(col(docCol).as("b_id"), col("sig").as("sb"))
        .hint("shuffle_hash"), "b_id")
      .withColumn("n_agree", nAgree)
      .withColumn("est", col("n_agree").cast("double") / numHashes)
      .filter(col("est") >= minEst)
      .select("a_id", "b_id", "n_agree", "est")
  }

  /** DuckDB oracle for [[minhashPairs]]' integer projection
    * (a_id, b_id, n_agree): the same permutation constants, the same
    * md5-based base hash, the same band equality — generated from one
    * set of constants so engine and oracle can never drift.
    *
    * @param shingleSrcSql SQL producing (doc_id, shl LIST<VARCHAR>)
    */
  def minhashOracleSql(shingleSrcSql: String, numHashes: Int, bands: Int,
      minEst: Double): String = {
    val r = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"MIN((${coeffA(i)} * h0 + ${coeffB(i)}) % $P) AS m$i")
      .mkString(", ")
    val bandJoins = (0 until bands).map { j =>
      val conds = (0 until r).map(i => s"a.m${j * r + i} = b.m${j * r + i}")
        .mkString(" AND ")
      s"SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM sig a JOIN sig b ON $conds AND a.doc_id < b.doc_id"
    }.mkString(" UNION ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    val thr = math.ceil(minEst * numHashes).toLong
    s"""WITH shd AS (SELECT DISTINCT doc_id, sh FROM
           (SELECT doc_id, unnest(shl) AS sh FROM ($shingleSrcSql) s0) s1),
         h AS (SELECT doc_id, ${Canonical.xhashSql("sh")} % $P AS h0 FROM shd),
         sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
         cand AS ($bandJoins)
       SELECT c.a_id, c.b_id, CAST($agree AS BIGINT) AS n_agree
       FROM cand c JOIN sig a ON a.doc_id = c.a_id
                   JOIN sig b ON b.doc_id = c.b_id
       WHERE ($agree) >= $thr
       ORDER BY a_id, b_id"""
  }

  /** DuckDB oracle for [[MinHashIndex.dedupAgainst]]' integer
    * projection (hist_id, new_id, n_agree), with history and batch as
    * predicate-defined slices of `documents`: the same permutation
    * constants and band equalities as [[minhashOracleSql]], but the
    * band joins are ORIENTED history × batch (no a < b — the
    * orientation IS the slice split, and a doc present in both slices
    * legitimately self-matches at n_agree = numHashes, the index's
    * "already ingested" contract).
    */
  def minhashIncrementalOracleSql(shingleSrcSql: String, numHashes: Int,
      bands: Int, minEst: Double, histPred: String,
      batchPred: String): String = {
    val r = numHashes / bands
    val minCols = (0 until numHashes)
      .map(i => s"MIN((${coeffA(i)} * h0 + ${coeffB(i)}) % $P) AS m$i")
      .mkString(", ")
    val bandJoins = (0 until bands).map { j =>
      val conds = (0 until r).map(i => s"a.m${j * r + i} = b.m${j * r + i}")
        .mkString(" AND ")
      s"SELECT a.doc_id AS hist_id, b.doc_id AS new_id FROM hist a JOIN nw b ON $conds"
    }.mkString(" UNION ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    val thr = math.ceil(minEst * numHashes).toLong
    s"""WITH shd AS (SELECT DISTINCT doc_id, sh FROM
           (SELECT doc_id, unnest(shl) AS sh FROM ($shingleSrcSql) s0) s1),
         h AS (SELECT doc_id, ${Canonical.xhashSql("sh")} % $P AS h0 FROM shd),
         sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
         hist AS (SELECT * FROM sig WHERE $histPred),
         nw AS (SELECT * FROM sig WHERE $batchPred),
         cand AS ($bandJoins)
       SELECT c.hist_id, c.new_id, CAST($agree AS BIGINT) AS n_agree
       FROM cand c JOIN sig a ON a.doc_id = c.hist_id
                   JOIN sig b ON b.doc_id = c.new_id
       WHERE ($agree) >= $thr
       ORDER BY hist_id, new_id"""
  }

  // ---------------------------------------------------------------- simhash

  /** Simhash bit width: [[Canonical.xhash]] yields 60 usable bits. */
  val SimhashBits = 60

  /** Per-doc simhash as a single relational aggregation: 60 per-bit vote
    * sums in one codegen'd hash agg (map-side combinable), signs packed
    * into a BIGINT in the output projection. No typed-encoder boundary —
    * this is the fast path AND the oracle-able path (pure integer ops on
    * the cross-engine hash).
    */
  def simhashes(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", Canonical.xhash(col("tok")))
    val votes = (0 until SimhashBits).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$j")
    }
    val packed = (0 until SimhashBits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** DuckDB oracle for [[simhashes]] over the `documents` table —
    * same hash, same votes, same packing.
    */
  def simhashOracleSql: String = {
    val votes = (0 until SimhashBits)
      .map(j => s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(", ")
    val bits = (0 until SimhashBits)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
         h AS (SELECT doc_id, ${Canonical.xhashSql("tok")} AS h FROM toks
               WHERE tok <> ''),
         v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM v
       ORDER BY doc_id"""
  }

  /** Typed-Aggregator formulation of the same simhash (the UDAF surface,
    * SURVEY §2.2 #49): the buffer is the per-bit vote count, merged
    * associatively (map-side combine), finished by taking vote signs.
    * Differentially tested equal to the relational [[simhashes]].
    */
  class SimhashAgg extends Aggregator[(Long, Long), Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], in: (Long, Long)): Array[Int] = {
      val h = in._2
      var j = 0
      while (j < 64) { b(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      b
    }
    override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { x(j) += y(j); j += 1 }
      x
    }
    override def finish(b: Array[Int]): Long = {
      var out = 0L
      var j = 0
      while (j < 64) { if (b(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[SimhashAgg]]-based simhash — identical output to [[simhashes]]
    * (the md5 hash has zero top bits, so 64-bit votes match 60-bit).
    */
  def simhashesTyped(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val tokenHashes: Dataset[(Long, Long)] = docs
      .select(col(idCol).cast("long"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), Canonical.xhash(col("tok")))
      .as[(Long, Long)]
    tokenHashes
      .groupByKey(_._1)
      .agg(new SimhashAgg().toColumn.name("simhash"))
      .toDF(idCol, "simhash")
  }

  /** Near-dup pairs within `maxHamming` (≤ 3 guaranteed found by the
    * 4×16-bit chunk pigeonhole; larger distances best-effort).
    */
  def simhashPairs(spark: SparkSession, docs: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    // Round 16: the signature frame feeds both sides of the chunk
    // self-join — unpersisted, the tokenize + 60-vote aggregation ran
    // ~2× per run (same class as minhashPairs). One doc → one long:
    // bounded cache at any corpus size.
    val sh = graft.CacheTracker.track(simhashes(spark, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val chunks = sh.select(col("doc_id").as("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("simhash"), 16 * c)
          .bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("ck"))
    val a = chunks.toDF("a_id", "a_sim", "ck")
    val b = chunks.toDF("b_id", "b_sim", "ck")
    // merge-pinned: exploded self-join (see ngramJaccardPairs)
    a.join(b.hint("merge"), "ck").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("ham"))
      .distinct()
      .filter(col("ham") <= maxHamming)
  }

  // ------------------------------------------------------------- embeddings

  /** Deterministic Gaussian hyperplanes for sign-LSH. */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH:
    * `tables` independent 8-bit sign buckets (multi-table → recall),
    * cosine computed only within colliding buckets, threshold `minCos`.
    * The scale path: bucket join shuffles O(n), never O(n²).
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double, dim: Int = 64, tables: Int = 2,
      planesPerTable: Int = 8): DataFrame = {
    val ps = planes(tables * planesPerTable, dim)
    def bucket(t: Int): Column =
      (0 until planesPerTable)
        .map(j => VectorFns.planeSign(col(vecCol), ps(t * planesPerTable + j)) * lit(1 << j))
        .reduce(_ + _)
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucket(t).as("bkt"))): _*)).as("tb"))
    val a = bucketed.toDF("a_id", "a_v", "tb")
    val b = bucketed.toDF("b_id", "b_v", "tb")
    // merge-pinned: exploded self-join (see ngramJaccardPairs)
    a.join(b.hint("merge"), "tb").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorFns.cosine(col("a_v"), col("b_v")).as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
  }

  /** [[embeddingPairs]] under the hash-gate contract: INTEGER
    * hyperplanes ([[VectorFns.intPlanes]]) over micro-unit-quantized
    * vectors, so bucketing is exact integer arithmetic and the cosine
    * is the single-IEEE-op sequence of
    * [[Similarity.bruteTopKExact]] — the oracle
    * ([[embeddingPairsExactOracleSql]]) re-derives buckets, pairs, and
    * scores identically in DuckDB. Pairs distinct on the id pair alone
    * (two longs through the exchange), vectors re-joined after.
    */
  def embeddingPairsExact(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double, dim: Int = 64, tables: Int = 2,
      planesPerTable: Int = 8): DataFrame = {
    import graft.functions.VectorFns.{intPlanes, intPlaneDot}
    import Similarity.{quant, sumsq, idot}
    val ps = intPlanes(tables * planesPerTable, dim)
    def buckets(qv: Column) =
      array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          (0 until planesPerTable)
            .map(j => when(intPlaneDot(qv, ps(t * planesPerTable + j)) >= 0,
              lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("bkt"))
      }: _*)
    // Round 16: qd feeds four reads (bucket self-join a/b + the two
    // verification joins) — unpersisted, the per-vector quantization
    // ran up to 4× per run (same class as minhashPairs). Persist +
    // force: one pass, cached reads. docs × 64 bytes — bounded.
    val qd = graft.CacheTracker.track(
      emb.select(col(idCol).as("id"), quant(col(vecCol)).as("qa"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bucketed = qd.select(col("id"), explode(buckets(col("qa"))).as("tb"))
    val candIds = bucketed.toDF("a_id", "tb")
      // merge-pinned: exploded self-join (see ngramJaccardPairs)
      .join(bucketed.toDF("b_id", "tb").hint("merge"), "tb")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    val withN = qd.withColumn("nn", sumsq(col("qa")))
    candIds
      .join(withN.select(col("id").as("a_id"), col("qa").as("va"),
        col("nn").as("na")).hint("shuffle_hash"), "a_id")
      .join(withN.select(col("id").as("b_id"), col("qa").as("vb"),
        col("nn").as("nb")).hint("shuffle_hash"), "b_id")
      .withColumn("cos", idot(col("va"), col("vb")).cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id", "cos")
  }

  /** DuckDB oracle for [[embeddingPairsExact]] over `embeddings`
    * (id = vec_id, vec = embedding), top-`limit` pairs by cosine.
    */
  def embeddingPairsExactOracleSql(minCos: Double, limit: Int,
      dim: Int = 64, tables: Int = 2, planesPerTable: Int = 8): String =
    s"""WITH xs AS (
           SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
                  embedding FROM embeddings),
         qv AS (SELECT vec_id, i,
                  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
                FROM xs),
         nrm AS (SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nn
                 FROM qv GROUP BY vec_id),
         pl AS (${VectorFns.intPlanesSql(tables * planesPerTable, dim)}),
         dp AS (SELECT v.vec_id, pl.p, CAST(SUM(v.x * pl.w) AS BIGINT) AS d
                FROM qv v JOIN pl ON v.i = pl.i GROUP BY v.vec_id, pl.p),
         bk AS (SELECT vec_id, p // $planesPerTable AS t,
                  CAST(SUM(CASE WHEN d >= 0 THEN (1 << (p % $planesPerTable)) ELSE 0 END) AS BIGINT) AS bkt
                FROM dp GROUP BY vec_id, p // $planesPerTable),
         cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
                  FROM bk a JOIN bk b ON a.t = b.t AND a.bkt = b.bkt
                  WHERE a.vec_id < b.vec_id),
         dots AS (SELECT cd.a_id, cd.b_id, CAST(SUM(a.x * b.x) AS BIGINT) AS dot
                  FROM cand cd
                  JOIN qv a ON a.vec_id = cd.a_id
                  JOIN qv b ON b.vec_id = cd.b_id AND b.i = a.i
                  GROUP BY cd.a_id, cd.b_id),
         scored AS (
           SELECT d.a_id, d.b_id,
                  CAST(d.dot AS DOUBLE) /
                    SQRT(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cos
           FROM dots d JOIN nrm na ON na.vec_id = d.a_id
                       JOIN nrm nb ON nb.vec_id = d.b_id)
       SELECT a_id, b_id, cos FROM scored
       WHERE cos >= $minCos
       ORDER BY cos DESC, a_id, b_id LIMIT $limit"""

  /** EXACT SUBSTRING dedup (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr
    * operation, re-expressed relationally): find every `w`-token
    * window whose content occurs MORE THAN ONCE across the corpus,
    * keep the globally first occurrence, and mark every other
    * occurrence's token range for removal; overlapping/adjacent
    * marked ranges merge into maximal spans per document.
    *
    * The reference algorithm builds a monolithic suffix array — a
    * single-machine structure. The distributed shape here is the
    * standard shingle-fingerprint program with the SAME contract on
    * window granularity: per doc, a NARROW pass fingerprints all
    * `n−w+1` windows ([[Canonical.xhash]] over the space-joined
    * slice — tokens are space-split so the joiner is injective, and
    * the hash is computable identically in DuckDB, which is what
    * makes this oracle-able); one hash aggregation finds duplicated
    * fingerprints (count + min-struct keeper — BOTH partially
    * aggregable, so the hot-shingle key never concentrates raw
    * occurrences in one task); one equi-join marks non-keeper
    * occurrences; a per-document window merges ranges
    * (gaps-and-islands — partition cardinality bounded by document
    * length, never corpus size). Total cost: two shuffles of
    * O(total tokens) rows, no O(n²) anywhere.
    *
    * Returns one row per AFFECTED document:
    * `(doc_id, n_spans, removed_tokens, kept_tokens)`.
    *
    * @param w duplicated-window length in tokens (Lee et al. use 50
    *          BPE tokens at corpus scale; tests use smaller windows
    *          to match fixture document lengths)
    */
  def exactSubstrSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2, "window length must be at least 2 tokens")
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= w)
    // all w-token window fingerprints, 0-based start positions; the
    // transform/posexplode pair keeps the expansion NARROW (no
    // intermediate w-times token blowup).
    // Round 16: sh feeds BOTH the duplicate aggregation and the mark
    // join's probe side — unpersisted, the md5-per-window fingerprint
    // pass (the operator's dominant cost) ran ~2× per run. Persist +
    // force: one fingerprint pass, two cached reads.
    val sh = graft.CacheTracker.track(toks.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("toks")) - w),
        i => Canonical.xhash(concat_ws(" ",
          slice(col("toks"), i + 1, lit(w)))))).as(Seq("pos", "h")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // duplicated windows with their global first occurrence — the
    // min-struct aggregates map-side, so a window duplicated a
    // billion times still reduces before the shuffle
    val dup = sh.groupBy("h")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("cnt") > 1)
    // merge-pinned: both sides corpus-scale token frames (see
    // ngramJaccardPairs on why their estimates can't be trusted)
    val rem = sh.join(dup.hint("merge"), "h")
      .filter(!(col("doc_id") === col("keep.doc_id") &&
        col("pos") === col("keep.pos")))
      .select(col("doc_id"), col("pos").cast("long").as("st"),
        (col("pos") + w).cast("long").as("en"))
    // merge [st, en) ranges per doc: island starts where st clears
    // every previous range's end (adjacent ranges merge — their
    // removal is contiguous)
    val byDoc = Window.partitionBy("doc_id").orderBy("st")
    val runMax = max("en").over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = rem
      .withColumn("newi",
        when(col("st") > coalesce(runMax, lit(-1L)), 1).otherwise(0))
      .withColumn("island", sum("newi").over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min("st").as("s"), max("en").as("e"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("removed_tokens"))
      .join(toks.select(col("doc_id"),
        size(col("toks")).cast("long").as("nt")).hint("shuffle_hash"),
        "doc_id")
      .select(col("doc_id"), col("n_spans"), col("removed_tokens"),
        (col("nt") - col("removed_tokens")).as("kept_tokens"))
  }

  /** DuckDB oracle for [[exactSubstrSpans]] — the same program in SQL
    * (fingerprints via [[Canonical.xhashSql]], keeper via a
    * row_number window, islands via the same running-max spelling).
    */
  def exactSubstrOracleSql(w: Int): String = {
    val hash = Canonical.xhashSql(
      s"array_to_string(toks[p + 1 : p + $w], ' ')")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
         tl AS (SELECT doc_id, toks, len(toks) AS n FROM t
                WHERE len(toks) >= $w),
         sh AS (SELECT doc_id, CAST(u.p AS BIGINT) AS pos, $hash AS h
                FROM tl, UNNEST(range(0, n - $w + 1)) AS u(p)),
         dup AS (SELECT h, COUNT(*) AS cnt FROM sh GROUP BY h
                 HAVING COUNT(*) > 1),
         ranked AS (SELECT s.doc_id, s.pos, s.h,
                           row_number() OVER (PARTITION BY s.h
                             ORDER BY s.doc_id, s.pos) AS rn
                    FROM sh s JOIN dup d USING (h)),
         rem AS (SELECT doc_id, pos AS st, pos + $w AS en
                 FROM ranked WHERE rn > 1),
         mx AS (SELECT doc_id, st, en,
                       MAX(en) OVER (PARTITION BY doc_id ORDER BY st
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev
                FROM rem),
         isl AS (SELECT doc_id, st, en,
                        SUM(CASE WHEN st > COALESCE(prev, -1)
                            THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY st
                            ROWS UNBOUNDED PRECEDING) AS island
                 FROM mx),
         spans AS (SELECT doc_id, island, MIN(st) AS s, MAX(en) AS e
                   FROM isl GROUP BY doc_id, island),
         summ AS (SELECT doc_id, COUNT(*) AS n_spans,
                         SUM(e - s) AS removed FROM spans
                  GROUP BY doc_id)
       SELECT m.doc_id, CAST(m.n_spans AS BIGINT) AS n_spans,
              CAST(m.removed AS BIGINT) AS removed_tokens,
              CAST(tl.n - m.removed AS BIGINT) AS kept_tokens
       FROM summ m JOIN tl USING (doc_id)
       ORDER BY doc_id"""
  }
}

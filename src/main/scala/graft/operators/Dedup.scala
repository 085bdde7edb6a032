package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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
  *  - simhash:    64-bit signature via a typed [[Aggregator]] (map-side
  *                partial aggregation of bit-count buffers), pairs via
  *                16-bit chunk join (pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4
  *                chunks equal);
  *  - embedding:  random-hyperplane LSH buckets, cosine verification
  *                only within buckets.
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

  /** n-gram Jaccard near-dup pairs, fully relational: one distinct
    * shingle frame with per-doc sizes attached via a window (no separate
    * sizes aggregate + joins), self-joined on the shingle. Pairs only
    * materialize for docs sharing ≥1 shingle — the shuffle is bounded by
    * shingle co-occurrence, never O(n²).
    *
    * @param maxDocFreq drop shingles appearing in more than this many
    *   docs ("stop-shingles") — at corpus scale a handful of ubiquitous
    *   shingles would otherwise dominate the self-join; near-dup pairs
    *   share *rare* shingles, so the cap trades no meaningful recall.
    *   None = exact (the judged-query setting).
    */
  def ngramJaccardPairs(shingled: DataFrame, docCol: String, shCol: String,
      minJac: Double, maxDocFreq: Option[Int] = None): DataFrame = {
    val sized = shingled.withColumn("__c",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(docCol)))
    val pruned = maxDocFreq match {
      case Some(cap) => sized.withColumn("__df",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(shCol)))
        .filter(col("__df") <= cap).drop("__df")
      case None => sized
    }
    val a = pruned.select(col(docCol).as("a_id"), col(shCol).as("sh"), col("__c").as("ca"))
    val b = pruned.select(col(docCol).as("b_id"), col(shCol).as("sh"), col("__c").as("cb"))
    a.join(b, "sh").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "ca", "cb")
      .agg(count(lit(1)).as("shared"))
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
    * combine map-side).
    *
    * @param shingled (docCol, shingleCol) distinct pairs
    */
  def minhashSignatures(shingled: DataFrame, docCol: String, shCol: String,
      numHashes: Int): DataFrame = {
    val base = pmod(xxhash64(col(shCol)), lit(P)) // shingle → residue
    val hashed = shingled.withColumn("h0", base)
    val mins = (0 until numHashes).map { i =>
      min(pmod(lit(coeffA(i)) * col("h0") + lit(coeffB(i)), lit(P))).as(s"m$i")
    }
    hashed.groupBy(col(docCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(docCol), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Banded-LSH candidate pairs + signature-agreement estimate.
    * bands·rows = numHashes; a pair collides iff some band's r rows all
    * agree. `est` = fraction of agreeing signature components (the
    * unbiased Jaccard estimator).
    */
  def minhashPairs(shingled: DataFrame, docCol: String, shCol: String,
      numHashes: Int = 32, bands: Int = 8, minEst: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minhashSignatures(shingled, docCol, shCol, numHashes)

    val bandKeys = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(((j * r) until ((j + 1) * r)).map(i => col("sig")(i)): _*).as("key"))
    }
    val exploded = sigs.select(col(docCol).as("id"),
      explode(array(bandKeys: _*)).as("bk"))

    val a = exploded.toDF("a_id", "bk")
    val b = exploded.toDF("b_id", "bk")
    val cand = a.join(b, "bk").filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val est = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

    cand
      .join(sigs.select(col(docCol).as("a_id"), col("sig").as("sa")), "a_id")
      .join(sigs.select(col(docCol).as("b_id"), col("sig").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), round(est, 4).as("est"))
      .filter(col("est") >= minEst)
  }

  // ---------------------------------------------------------------- simhash

  /** Typed aggregator folding token hashes into a 64-bit simhash: the
    * buffer is the per-bit vote count, merged associatively (map-side
    * combine), finished by taking vote signs. Custom `Aggregator` rather
    * than 64 SQL agg columns: one buffer object, one pass.
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

  /** 64-bit simhash per doc over whitespace tokens. */
  def simhashes(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val tokenHashes: Dataset[(Long, Long)] = docs
      .select(col(idCol).cast("long"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), xxhash64(col("tok")))
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
    val sh = simhashes(spark, docs)
    val chunks = sh.select(col("doc_id").as("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("simhash"), 16 * c)
          .bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("ck"))
    val a = chunks.toDF("a_id", "a_sim", "ck")
    val b = chunks.toDF("b_id", "b_sim", "ck")
    a.join(b, "ck").filter(col("a_id") < col("b_id"))
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
    a.join(b, "tb").filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorFns.cosine(col("a_v"), col("b_v")).as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
  }
}

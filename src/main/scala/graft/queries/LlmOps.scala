package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Contract.Q

/** L3 north-star operator queries (SURVEY §2.2 L3): the LLM-training-data
  * pipeline surface — dedup, text analysis, fingerprinting, similarity,
  * multimodal — over the `documents` / `embeddings` tables.
  *
  * Every op here is hash-judged. The signature pipelines (minhash,
  * simhash) are pure integer programs on the md5-based
  * [[graft.Canonical.xhash]]; the similarity family (brute/LSH/IVF ANN,
  * embedding near-dup) runs under the quantized-integer contract —
  * micro-unit quantization, md5-derived integer hyperplanes, exact
  * integer centroid sums, one IEEE-op cosine — so buckets, candidates,
  * and ranks are bit-reproducible in DuckDB. The raw-float variants
  * remain as API surface with tolerance/recall ScalaTests (SURVEY §2.4).
  */
object LlmOps {

  /** Trained tokenizer per source generation (fingerprint → tok) —
    * model-sized driver state, the HNSW build-once discipline applied
    * to training so bench reps pay encode, not re-training. Bounded:
    * a vocab-sized pieces frame per entry would otherwise accumulate
    * across source generations in a long-lived session, so the oldest
    * entries evict past a handful (access-ordered LinkedHashMap).
    */
  private val tokCache = {
    val m = new java.util.LinkedHashMap[(SparkSession, Long),
        graft.operators.Bpe.Tokenizer](
      8, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, Long),
            graft.operators.Bpe.Tokenizer]): Boolean =
        size() > 4
    }
    scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
  }

  /** Cache key for session-bound driver state over a parquet source: a
    * Tokenizer's pieces frame belongs to the SparkSession that trained
    * it, so the session's identity is part of the key (a hit from a
    * different — possibly stopped — session would hand out a dead
    * frame), and the source fingerprint folds EVERY data file's name,
    * length, and mtime (a directory's own `length()` is meaningless
    * and a regenerated same-size corpus inside mtime granularity would
    * collide on the old length^mtime scheme). `salt` separates
    * consumers training different configurations off the same source.
    */
  private def tokKey(s: SparkSession, path: String,
      salt: Long): (SparkSession, Long) =
    // the session OBJECT is the key component (reference equality —
    // SparkSession doesn't override equals): identityHashCode alone
    // can collide across two live sessions, handing one a frame owned
    // by the other; the bounded cache pinning ≤4 sessions is fine
    (s, srcFp(path) ^ salt)

  /** Content fingerprint of a parquet source path: every data file's
    * name, length, and mtime folded in name order. Shared by the
    * tokenizer cache and the persisted-index build-once guards
    * (`ann_ivf_index`, `dedup_incremental`) — a regenerated same-size
    * source invalidates, unlike a root-level length^mtime probe.
    */
  private def srcFp(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        // listFiles() returns NULL (not empty) on I/O error or a
        // directory vanishing mid-walk — degrade to a retrain, never
        // an NPE inside a judged query
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
          .foldLeft(17L)((a, c) => a * 1099511628211L ^ walk(c))
      else f.getName.hashCode.toLong * 2654435761L ^
        f.length * 31L ^ f.lastModified
    walk(new java.io.File(path))
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Word 3-gram shingles, distinct per doc: the shared substrate for
    * n-gram Jaccard, minhash, and winnowing fingerprints. Relational
    * (explode → distinct), so it scales as a shuffle, not a UDF loop.
    */
  def shingles(d: DataFrame): DataFrame = shinglesRaw(d).distinct()

  /** [[shingles]] without the distinct — NO shuffle at all (narrow
    * explode off the scan). Consumers whose first aggregation dedups
    * anyway (collect_set indexes, MIN-permutation sketches) should take
    * this and save the (doc, shingle) exchange.
    */
  def shinglesRaw(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as("sh"))

  /** Oracle-side spelling of [[shingles]] (DuckDB list ops). */
  val shinglesSql: String =
    """SELECT DISTINCT doc_id,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shl
       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       WHERE len(toks) >= 3"""

  /** Oracle-side connected components of the n-gram-Jaccard near-dup
    * graph (minJac = 0.2): recursive min-label propagation ending in a
    * `comps(id, comp)` relation — the shared substrate of the
    * `dedup_components` and `dedup_canonical` oracles (the engine side
    * uses [[graft.operators.Components]], a different algorithm).
    *
    * Two sf1-scale survival choices (round 12 — the naive closure
    * stalled the sf1 soak for 80+ minutes on ONE query):
    * `edges AS MATERIALIZED` stops DuckDB inlining the ENTIRE pair
    * pipeline into every recursive iteration (observed ≈9 re-runs of
    * a ~4-minute prefix), and the guarded label recursion
    * (`lab < e.d`) floods only the component-min label instead of
    * materializing the full transitive closure's reachable-pair set.
    */
  val componentsCteSql: String =
    s"""WITH RECURSIVE sh AS (
         SELECT doc_id, unnest(shl) AS sh FROM ($shinglesSql) s),
       shd AS (SELECT DISTINCT doc_id, sh FROM sh),
       dfq AS (SELECT sh, COUNT(*) AS dfc FROM shd GROUP BY sh),
       shp AS (SELECT shd.doc_id, shd.sh FROM shd
               JOIN dfq ON shd.sh = dfq.sh WHERE dfq.dfc <= 1000),
       sizes AS (SELECT doc_id, COUNT(*) AS c FROM shp GROUP BY doc_id),
       rawp AS (
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
         FROM shp a JOIN shp b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id),
       pairs AS (
         SELECT a_id, b_id FROM rawp
         JOIN sizes ca ON ca.doc_id = a_id
         JOIN sizes cb ON cb.doc_id = b_id
         WHERE ROUND(CAST(shared AS DOUBLE) / (ca.c + cb.c - shared), 4) >= 0.2),
       edges AS MATERIALIZED (
         SELECT a_id AS s, b_id AS d FROM pairs
         UNION SELECT b_id, a_id FROM pairs),
       reach(id, lab) AS (
         SELECT s, LEAST(s, d) FROM edges
         UNION
         SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
         WHERE r.lab < e.d),
       comps AS (
         SELECT id, MIN(lab) AS comp FROM reach GROUP BY id)"""

  /** Per-doc unigram-LM encoding cost (doc_id, nt, bits, bpt) — the
    * shared engine side of `text_perplexity` and `text_ccnet_buckets`.
    * Per-token surprisal is log2-QUANTIZED (⌊log2 N⌋−⌊log2 c⌋ as
    * `length(bin(x))−1`, exact integers both engines — libm log is not
    * correctly rounded); bits/token is one exact-int IEEE division +
    * rule-3 round.
    */
  private def lmSurprisal(d: DataFrame): DataFrame = {
    val toks = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val nTot = vocab.agg(sum(col("c")).as("n"))
    val surprisal = vocab.crossJoin(broadcast(nTot))
      .select(col("tok"),
        ((length(bin(col("n"))) - 1) - (length(bin(col("c"))) - 1))
          .cast("long").as("s"))
    // STRATEGY-PINNED: surprisal is vocab-scale and explode-descended
    // (estimates meaningless — the Dedup.ngramJaccardPairs broadcast
    // class); shuffle_hash builds bounded per-partition token maps
    tf.join(surprisal.hint("shuffle_hash"), "tok")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("nt"), sum(col("tf") * col("s")).as("bits"))
      .withColumn("bpt", round(col("bits").cast("double") / col("nt"), 4))
  }

  /** Oracle-side CTE chain ending in `d(doc_id, nt, bits, bpt)` —
    * the DuckDB spelling of [[lmSurprisal]].
    */
  private val lmSurprisalCteSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
       tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
              FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
       v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
             FROM toks WHERE tok <> '' GROUP BY tok),
       n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM v),
       s AS (SELECT v.tok,
               CAST((LENGTH(bin(n.n)) - 1) - (LENGTH(bin(v.c)) - 1) AS BIGINT) AS s
             FROM v, n),
       d AS (SELECT tf.doc_id,
                    CAST(SUM(tf.tf) AS BIGINT) AS nt,
                    CAST(SUM(tf.tf * s.s) AS BIGINT) AS bits,
                    ROUND(CAST(SUM(tf.tf * s.s) AS DOUBLE) / SUM(tf.tf), 4) AS bpt
             FROM tf JOIN s ON tf.tok = s.tok
             GROUP BY tf.doc_id)"""

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Exact dedup: duplicate-text groups, canonical keeper = min doc_id.
    ("dedup_exact",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .groupBy("text")
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .select("keep_id", "n")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents
              GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id""")),

    // Exact SUBSTRING dedup (Lee et al. 2021 ExactSubstr, relational):
    // every 8-token window occurring >1× corpus-wide marks its
    // non-first occurrences for removal; overlapping marks merge into
    // maximal per-doc spans. Judged output = per affected doc the span
    // count, removed and kept token totals — the removal manifest a
    // cleaning pass would apply. Two O(tokens) shuffles, no window
    // over a corpus-scale key (see Dedup.exactSubstrSpans scaladoc).
    ("dedup_substring",
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup
          .exactSubstrSpans(docs(s, dir), "doc_id", "text", w = 8)
          .orderBy("doc_id"),
      Some(graft.operators.Dedup.exactSubstrOracleSql(w = 8))),

    // n-gram Jaccard near-dup pairs, fully relational (shingle self-join;
    // the 100 TB path — no O(n²) cross join, pairs only materialize for
    // docs sharing ≥1 shingle).
    ("dedup_ngram_jaccard",
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup
          .ngramJaccardPairs(shinglesRaw(docs(s, dir)), "doc_id", "sh", minJac = 0.2)
          .orderBy("a_id", "b_id"),
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(shl) AS sh FROM ($shinglesSql) s),
               shd AS (SELECT DISTINCT doc_id, sh FROM sh),
               dfq AS (SELECT sh, COUNT(*) AS dfc FROM shd GROUP BY sh),
               shp AS (SELECT shd.doc_id, shd.sh FROM shd
                       JOIN dfq ON shd.sh = dfq.sh WHERE dfq.dfc <= 1000),
               sizes AS (SELECT doc_id, COUNT(*) AS c FROM shp GROUP BY doc_id),
               pairs AS (
                 SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
                 FROM shp a JOIN shp b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id)
               SELECT a_id, b_id,
                      ROUND(CAST(shared AS DOUBLE) / (ca.c + cb.c - shared), 4) AS jac
               FROM pairs
               JOIN sizes ca ON ca.doc_id = a_id
               JOIN sizes cb ON cb.doc_id = b_id
               WHERE ROUND(CAST(shared AS DOUBLE) / (ca.c + cb.c - shared), 4) >= 0.2
               ORDER BY a_id, b_id""")),

    // Token counting: whitespace tokens + a BPE-ish regex tokenizer.
    ("text_tokens",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("nt"),
            size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("nt_re"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS nt,
                CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS nt_re
              FROM documents ORDER BY doc_id""")),

    // Quality scoring: length / avg token length / stopword ratio.
    ("text_quality",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
          .select(col("doc_id"), col("n_chars"),
            split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("n_chars"), size(col("toks")).as("nt"),
            explode(col("toks")).as("tok"))
        d.groupBy("doc_id", "n_chars", "nt")
          .agg(sum(when(col("tok").isin(graft.functions.TextFns.stopwords: _*), 1)
            .otherwise(0)).cast("long").as("nstop"))
          .select(
            col("doc_id"),
            col("nt"),
            round((col("n_chars") - (col("nt") - 1)).cast("double") / col("nt"), 4)
              .as("avg_tok_len"),
            round(col("nstop").cast("double") / col("nt"), 4).as("stop_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, n_chars,
                        CAST(len(string_split(text, ' ')) AS INT) AS nt,
                        unnest(string_split(text, ' ')) AS tok
                 FROM documents)
               SELECT doc_id, nt,
                      ROUND(CAST(n_chars - (nt - 1) AS DOUBLE) / nt, 4) AS avg_tok_len,
                      ROUND(CAST(SUM(CASE WHEN tok IN (${graft.functions.TextFns.stopwordsSqlList}) THEN 1 ELSE 0 END) AS DOUBLE) / nt, 4) AS stop_ratio
               FROM toks GROUP BY doc_id, n_chars, nt ORDER BY doc_id""")),

    // Intra-document repetition (Gopher-style quality signal): the
    // fraction of word 3-grams that are repeats of an earlier 3-gram in
    // the SAME document. Fully narrow — per-row array arithmetic off
    // the scan, no explode, no shuffle: the cheapest possible shape for
    // a per-document score at corpus scale.
    ("text_repetition",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            (size(col("toks")) - 2).cast("bigint").as("n3"),
            size(array_distinct(expr(
              "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
              .cast("bigint").as("n3d"))
          .select(col("doc_id"), col("n3"), col("n3d"),
            round(lit(1.0) - col("n3d").cast("double") / col("n3"), 4)
              .as("rep_ratio"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n3, n3d,
                     ROUND(1.0 - CAST(n3d AS DOUBLE) / n3, 4) AS rep_ratio
              FROM (SELECT doc_id,
                           CAST(len(toks) - 2 AS BIGINT) AS n3,
                           CAST(len(list_distinct(list_transform(
                             range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS BIGINT) AS n3d
                    FROM (SELECT doc_id, string_split(text, ' ') AS toks
                          FROM documents)
                    WHERE len(toks) >= 3) q
              ORDER BY doc_id""")),

    // Language ID: stopword-lexicon n-gram heuristic, argmax hits.
    ("text_langid",
      (s: SparkSession, dir: String) =>
        graft.functions.TextFns.langId(s, docs(s, dir)).orderBy("doc_id"),
      Some(graft.functions.TextFns.langIdOracleSql)),

    // Document fingerprinting: whole-doc md5 + winnowing-style min
    // shingle fingerprint (smallest md5 over word 3-grams).
    ("text_fingerprint",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
        val wfp = shingles(d).groupBy("doc_id").agg(min(md5(col("sh"))).as("wfp"))
        // shuffle_hash: wfp is per-doc (corpus-scale) but explode-
        // descended — never let the estimate pick it as broadcast build
        d.select(col("doc_id"), md5(col("text")).as("fp"))
          .join(wfp.hint("shuffle_hash"), Seq("doc_id"), "left")
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(shl) AS sh FROM ($shinglesSql) s),
               w AS (SELECT doc_id, MIN(md5(sh)) AS wfp FROM (SELECT DISTINCT doc_id, sh FROM sh) d
                     GROUP BY doc_id)
               SELECT d.doc_id, md5(d.text) AS fp, w.wfp
               FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
               ORDER BY d.doc_id""")),

    // MinHash + banded LSH near-dup pairs (Broder) — a pure integer
    // pipeline on the md5-based cross-engine hash, judged end to end:
    // the oracle re-derives signatures, band collisions, and agreement
    // counts from the same constants in DuckDB SQL.
    ("dedup_minhash_lsh",
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup
          .minhashPairs(shingles(docs(s, dir)), "doc_id", "sh",
            numHashes = 32, bands = 8, minEst = 0.2)
          .select("a_id", "b_id", "n_agree")
          .orderBy("a_id", "b_id"),
      Some(graft.operators.Dedup.minhashOracleSql(shinglesSql,
        numHashes = 32, bands = 8, minEst = 0.2))),

    // Incremental near-dup against a PERSISTED MinHash index — the
    // daily-ingest shape every corpus-wide dedup row lacks: history
    // (even doc_ids) is signatured ONCE into index state, then the new
    // batch (odd doc_ids) probes it by banded LSH without recomputing
    // or even reading the historical text. Build-once into
    // fingerprinted state (the ann_ivf_index discipline, content
    // fingerprint); the oracle re-derives both slices' signatures and
    // the ORIENTED history × batch band joins in DuckDB SQL from the
    // same constants.
    ("dedup_incremental",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
        val fp = java.lang.Long.toHexString(
          srcFp(s"$dir/documents.parquet") ^ "mhidx_v1".hashCode.toLong)
        val root = s"target/graft_mhidx/$fp"
        val idx = new graft.operators.MinHashIndex(root,
          numHashes = 32, bands = 8)
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            idx.build(s, shingles(d.filter(col("doc_id") % 2 === 0)))
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        idx.dedupAgainst(s, shingles(d.filter(col("doc_id") % 2 === 1)),
            minEst = 0.2)
          .select("hist_id", "new_id", "n_agree")
          .orderBy("hist_id", "new_id")
      },
      Some(graft.operators.Dedup.minhashIncrementalOracleSql(shinglesSql,
        numHashes = 32, bands = 8, minEst = 0.2,
        histPred = "doc_id % 2 = 0", batchPred = "doc_id % 2 = 1"))),

    // The DELETION flow judged end-to-end: build the even-doc index,
    // RETRACT the multiples of 4 (tombstone anti-join — a removed doc
    // must stop suppressing lookalikes), probe the odd batch. The
    // oracle needs NO new machinery: retraction is exactly a stricter
    // history predicate on the same oriented-band-join program. Own
    // fingerprinted state root — remove() mutates state, so sharing
    // dedup_incremental's index would poison it.
    ("dedup_incremental_remove",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
        val fp = java.lang.Long.toHexString(
          srcFp(s"$dir/documents.parquet") ^ "mhidxrm_v1".hashCode.toLong)
        val root = s"target/graft_mhidxrm/$fp"
        val idx = new graft.operators.MinHashIndex(root,
          numHashes = 32, bands = 8)
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            idx.build(s, shingles(d.filter(col("doc_id") % 2 === 0)))
            idx.remove(s, d.filter(col("doc_id") % 4 === 0).select("doc_id"))
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        idx.dedupAgainst(s, shingles(d.filter(col("doc_id") % 2 === 1)),
            minEst = 0.2)
          .select("hist_id", "new_id", "n_agree")
          .orderBy("hist_id", "new_id")
      },
      Some(graft.operators.Dedup.minhashIncrementalOracleSql(shinglesSql,
        numHashes = 32, bands = 8, minEst = 0.2,
        histPred = "doc_id % 2 = 0 AND doc_id % 4 <> 0",
        batchPred = "doc_id % 2 = 1"))),

    // SimHash signatures per doc — one relational bit-vote aggregation
    // (codegen'd, map-side combinable), judged against the DuckDB
    // re-derivation. The typed-Aggregator formulation (UDAF surface) is
    // differentially ScalaTested equal to this one.
    ("dedup_simhash",
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.simhashes(s, docs(s, dir))
          .orderBy("doc_id"),
      Some(graft.operators.Dedup.simhashOracleSql)),

    // Embedding-cosine near-dup: LSH-bucketed candidates, top-20 pairs
    // by cosine — integer-hyperplane buckets over quantized vectors +
    // the single-IEEE-op cosine contract, so the whole pipeline
    // (buckets, pairs, scores) is re-derived identically by the DuckDB
    // oracle. The float-RNG-plane variant (Dedup.embeddingPairs) stays
    // as the API surface with its own ScalaTest.
    ("dedup_embedding",
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup
          .embeddingPairsExact(Tables(s, dir, "embeddings"), "vec_id", "embedding",
            minCos = -1.0)
          .orderBy(col("cos").desc, col("a_id"), col("b_id"))
          .limit(20),
      Some(graft.operators.Dedup.embeddingPairsExactOracleSql(minCos = -1.0, limit = 20))),

    // Brute-force cosine top-k ANN baseline (queries = vec_id < 10),
    // judged via the quantized-integer scoring contract: dots and norms
    // are exact BIGINTs, the cosine is one deterministic IEEE-op
    // sequence — bit-identical in DuckDB, hence hash-green.
    ("ann_brute_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        graft.operators.Similarity.bruteTopKExact(qs, emb, k = 5)
          .orderBy("q_id", "rank")
      },
      Some(graft.operators.Similarity.bruteTopKExactOracleSql(maxQueryId = 10, k = 5))),

    // SQ8 scalar-quantized ANN (the 1-byte-per-dimension scan tier):
    // int8 clamp-floor codes score every candidate, a bounded-heap
    // shortlist survives, and ONLY the shortlist is re-ranked by the
    // exact micro-unit cosine after rejoining vectors. Both tiers are
    // exact integer programs — the DuckDB oracle re-derives codes,
    // shortlist, and re-rank from the same constants.
    ("ann_sq8_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        graft.operators.Similarity.sq8TopK(qs, emb, k = 5, shortlist = 20)
          .orderBy("q_id", "rank")
      },
      Some(graft.operators.Similarity.sq8TopKOracleSql(
        maxQueryId = 10, k = 5, shortlist = 20))),

    // The SQ8 tier judged at a SECOND corpus size in the same round:
    // both sides pin sf0.001 (engine reads the fixed dir, oracle
    // read_parquet's the same file), so whatever SF the driver/soak
    // passes, this row exercises the tier at ~1/10 the default gate's
    // corpus — cheap insurance that the integer contract has no
    // size-dependent edge (AnnOracleSpec pins the OTHER tiers at two
    // SFs; this one puts a second scale in the DRIVER's own gate).
    ("ann_sq8_small",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, "/root/testdata/sf0.001", "embeddings")
        val qs = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        graft.operators.Similarity.sq8TopK(qs, emb, k = 3, shortlist = 10)
          .orderBy("q_id", "rank")
      },
      Some(graft.operators.Similarity.sq8TopKOracleSql(
        maxQueryId = 8, k = 3, shortlist = 10,
        relation =
          "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"))),

    // LSH-bucketed ANN: data-independent hyperplane buckets — the
    // index-free scale path (no centroid build; ingest is a pure map).
    // Judged via integer planes + the quantized scoring contract; the
    // DuckDB oracle re-derives buckets, candidates, and ranks from the
    // same constants. Float-plane lshTopK stays as the API surface
    // with a recall ScalaTest.
    ("ann_lsh_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        graft.operators.Similarity.lshTopKExact(qs, emb, k = 5)
          .orderBy("q_id", "rank")
      },
      Some(graft.operators.Similarity.lshTopKExactOracleSql(maxQueryId = 10, k = 5))),

    // IVF ANN: label-cell centroids, nprobe=3 — the pruned scale path.
    // Judged end to end: integer centroid sums + floored means make the
    // probe assignment deterministic, and candidate scoring follows the
    // quantized contract. Float ivfTopK stays as the API surface with a
    // recall ScalaTest.
    ("ann_ivf_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        graft.operators.Similarity.ivfTopKExact(qs, emb, "label", k = 5, nprobe = 3)
          .orderBy("q_id", "rank")
      },
      Some(graft.operators.Similarity.ivfTopKExactOracleSql(maxQueryId = 10, k = 5, nprobe = 3))),

    // PQ ANN (Jégou 2011): byte codes + per-query integer LUTs, ADC
    // shortlist, exact quantized re-rank. The full train/encode/search
    // pipeline is bit-deterministic (ProductQuantizerSpec proves
    // partition-invariance and ≥0.8 recall vs the judged brute
    // contract). M per-subspace Lloyd loops are beyond reasonable SQL,
    // so the hash oracle is AnnOracle.pqTopKSql — a transparent
    // driver-side sequential re-derivation of the same integer
    // program, embedded as a VALUES relation (see LlmOps.annOracles).
    ("ann_pq_topk",
      (s: SparkSession, dir: String) => {
        val pq = graft.operators.ProductQuantizer
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        // codebooks + codes are STATE (trained once per corpus, like
        // VectorIndex) — write-once per source generation, so the
        // query measures what production pays per search: LUT build +
        // code-table scan + shortlist re-rank
        val src = new java.io.File(s"$dir/embeddings.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "pq_v1".hashCode.toLong)
        val root = s"target/graft_pq/$fp"
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            val books = pq.train(s, emb, m = 16, ksub = 64, iters = 2)
            books.write.mode("overwrite").parquet(s"$root/books")
            pq.encode(s, emb, books, m = 16)
              .write.mode("overwrite").parquet(s"$root/enc")
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        pq.searchAdcRerank(s, qs, s.read.parquet(s"$root/enc"),
          s.read.parquet(s"$root/books"), emb,
          m = 16, ksub = 64, k = 5, shortlist = 64)
          .orderBy("q_id", "rank")
      },
      None),

    // IVF+PQ residual composition (Jégou 2011 §IV, IVFADC): label cells
    // as the coarse quantizer (the judged ann_ivf contract), PQ codes
    // trained on RESIDUALS qa − centroid(cell), search probes nprobe
    // cells and ADC-scores only their code rows via q·x ≈ q·c +
    // Σ lut[code_m]. Hash-judged the same way as ann_pq_topk: the
    // AnnOracle.ivfPqTopKSql driver re-derivation is the oracle;
    // ProductQuantizerSpec pins recall ≥ the flat-PQ floor and
    // partitioning invariance.
    ("ann_ivfpq_topk",
      (s: SparkSession, dir: String) => {
        val pq = graft.operators.ProductQuantizer
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val src = new java.io.File(s"$dir/embeddings.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "ivfpq_v1".hashCode.toLong)
        val root = s"target/graft_ivfpq/$fp"
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            val cents = pq.cellCentroids(emb, "label")
            cents.write.mode("overwrite").parquet(s"$root/cents")
            val books = pq.trainResidual(s, emb, "label",
              s.read.parquet(s"$root/cents"), m = 16, ksub = 64, iters = 2)
            books.write.mode("overwrite").parquet(s"$root/books")
            pq.encodeIvf(s, emb, "label", s.read.parquet(s"$root/cents"),
              s.read.parquet(s"$root/books"), m = 16)
              .write.mode("overwrite").parquet(s"$root/enc")
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        pq.searchIvfAdcRerank(s, qs, s.read.parquet(s"$root/enc"),
          s.read.parquet(s"$root/books"), s.read.parquet(s"$root/cents"),
          emb, m = 16, ksub = 64, k = 5, nprobe = 3, shortlist = 64)
          .orderBy("q_id", "rank")
      },
      None),

    // Graph-ANN tier (HNSW, Malkov & Yashunin 2016): per-shard
    // deterministic graphs + beam search + global top-k merge
    // (operators/Hnsw.scala). The index is STATE like the PQ
    // codebooks — built write-once per source generation — and the
    // query measures what production pays per search: shard beam
    // walks + the queries·ef·shards merge. A pointer-chasing graph
    // build is beyond reasonable SQL, so the hash oracle is
    // AnnOracle.hnswTopKSql's sequential re-derivation; HnswSpec pins
    // recall ≥ the 0.8 IVFADC re-rank floor at equal candidate budget
    // (ef = 64 = the ADC shortlist), bit-determinism, and
    // partitioning invariance.
    ("ann_hnsw_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val src = new java.io.File(s"$dir/embeddings.parquet")
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "hnsw_v1".hashCode.toLong)
        val root = s"target/graft_hnsw/$fp"
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            graft.operators.Hnsw.build(s, emb, shards = 4, m = 8, efC = 64)
              .write.mode("overwrite").parquet(s"$root/graph")
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        graft.operators.Hnsw.search(s, s.read.parquet(s"$root/graph"), qs,
          shards = 4, k = 5, efS = 64)
          .orderBy("q_id", "rank")
      },
      None),

    // Persistent IVF index tier (round 15 — [[operators.VectorIndex]]
    // judged end-to-end): build-once into fingerprinted state (k-means
    // from lowest-xxhash64 seeds, exact floored-integer Lloyd rounds),
    // then the nprobe-cell search — self-matches KEPT, the index
    // contract. Oracle: AnnOracle.ivfIndexTopKSql's sequential
    // re-derivation (see annOracles).
    ("ann_ivf_index",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val src = new java.io.File(s"$dir/embeddings.parquet")
        // _v2: the build algorithm changed in round 16 (sampled Lloyd
        // rounds) — the tag bump invalidates any _v1 state built with
        // unsampled centroids, which would otherwise silently judge
        // against the new sampled oracle
        val fp = java.lang.Long.toHexString(
          src.length ^ (src.lastModified * 31) ^ "ivfidx_v2".hashCode.toLong)
        val root = s"target/graft_ivfidx/$fp"
        val idx = new graft.operators.VectorIndex(root)
        LlmOps.synchronized {
          if (!new java.io.File(s"$root/_DONE").exists()) {
            idx.build(s, emb)
            new java.io.File(s"$root/_DONE").createNewFile()
          }
        }
        idx.search(s, qs, k = 5).orderBy("q_id", "rank")
      },
      None),

    // SemDeDup semantic dedup (cluster-then-prune, Abbas et al. 2023):
    // one Lloyd reassignment against exact-integer seed centroids, then
    // near-dup pairs scored only WITHIN each assigned cluster — the
    // published cost model (O(n·k) assignment + intra-cluster pairing,
    // never corpus-wide O(n²); k is the scale lever). The lever MOVES
    // with the corpus (round 15): k ≈ ⌈√n⌉ via subCells =
    // ⌈⌈√n⌉/#labels⌉ — assignment O(n·√n) and pairing O(n·√n) balance,
    // vs the fixed-seed quadratic Σ|cell|² the sf1 timing record
    // flagged at 17×. The pre-count is one model-sized agg (two
    // scalars); the oracle re-derives the same S from the same table.
    // Top-20 pairs by quantized cosine; min-id keeps. The assignment's
    // corpus × broadcast-centroid scoring is the whitelisted ann_ivf
    // BNLJ shape.
    ("dedup_semantic",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val hd = emb.agg(count(lit(1)), count_distinct(col("label"))).head
        val (n, nl) = (hd.getLong(0), math.max(1L, hd.getLong(1)))
        val kd = math.ceil(math.sqrt(n.toDouble)).toLong
        val sub = math.max(1L, (kd + nl - 1) / nl).toInt
        graft.operators.Similarity
          .semanticPairsExact(emb, "label", sub)
          .orderBy(col("cos").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      Some(graft.operators.Similarity.semanticPairsExactOracleSql(limit = 20))),

    // Multimodal: binary media column + metadata via built-in
    // expressions (codegen, no encoder round trip — the stub metadata is
    // a pure function of payload bytes, so mapPartitions would be the
    // anti-pattern here; Multimodal.decodeMeta keeps the per-partition
    // harness for real codecs and is ScalaTested equal to this path).
    ("multimodal_meta",
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal
          .metaExpr(graft.operators.Multimodal.fromDocuments(docs(s, dir)))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                1 + CAST(octet_length(encode(text)) % 640 AS INT) AS width,
                1 + CAST(octet_length(encode(text)) % 480 AS INT) AS height,
                1 + CAST(octet_length(encode(text)) % 10 AS INT) AS n_frames
              FROM documents ORDER BY doc_id""")),

    // As-of join (the time-series operator Spark lacks natively,
    // graft.operators.AsOfJoin): each click event picks up the latest
    // prior-or-simultaneous purchase by the same user. Oracle = DuckDB's
    // native ASOF LEFT JOIN — two independent formulations, one answer.
    ("asof_join",
      (s: SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events")
          .withColumn("eus", expr("unix_micros(cast(ts as timestamp))"))
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "event_id", "eus")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "eus", "value")
        graft.operators.AsOfJoin
          .backward(clicks, purchases, on = Seq("user_id"),
            leftTs = "eus", rightTs = "eus", rightVals = Seq("value"))
          .select(col("event_id"), col("user_id"),
            col("value_asof").as("pval"), col("eus_asof").as("pts"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, r.value AS pval, epoch_us(r.ts) AS pts
              FROM (SELECT * FROM events WHERE event_type = 'click') l
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
                ON l.user_id = r.user_id AND l.ts >= r.ts
              ORDER BY l.event_id""")),

    // Forward as-of join: each click picks up the NEXT purchase
    // at-or-after it by the same user — the mirrored window frame of
    // [[graft.operators.AsOfJoin.backward]]; oracle = DuckDB ASOF with
    // the inequality flipped (l.ts <= r.ts).
    ("asof_join_forward",
      (s: SparkSession, dir: String) => {
        val ev = Tables(s, dir, "events")
          .withColumn("eus", expr("unix_micros(cast(ts as timestamp))"))
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "event_id", "eus")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "eus", "value")
        graft.operators.AsOfJoin
          .forward(clicks, purchases, on = Seq("user_id"),
            leftTs = "eus", rightTs = "eus", rightVals = Seq("value"))
          .select(col("event_id"), col("user_id"),
            col("value_asof").as("pval"), col("eus_asof").as("pts"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, r.value AS pval, epoch_us(r.ts) AS pts
              FROM (SELECT * FROM events WHERE event_type = 'click') l
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
                ON l.user_id = r.user_id AND l.ts <= r.ts
              ORDER BY l.event_id""")),

    // Q32 — the custom TopKPerGroup physical operator (bounded heaps,
    // no sort — graft.plans) through the hash gate: same rows as the
    // window formulation, which is exactly what the oracle computes.
    ("q32_topk_operator",
      (s: SparkSession, dir: String) =>
        graft.plans.TopK.perGroup(
          Tables(s, dir, "customer").select("c_mktsegment", "c_custkey", "c_acctbal"),
          Seq("c_mktsegment"),
          Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
          .select("c_mktsegment", "c_custkey", "c_acctbal")
          .orderBy("c_mktsegment", "c_custkey"),
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey) AS rn
                FROM customer) q
              WHERE rn <= 3 ORDER BY c_mktsegment, c_custkey""")),

    // Connected components over the near-dup pair graph: pairwise
    // similarity → dedup groups (min-id labeling). Engine: size-adaptive
    // Components (single-task union-find under the edge threshold, the
    // case here; hash-min label propagation above it); oracle:
    // transitive closure by recursive CTE — different algorithms, one
    // answer.
    ("dedup_components",
      (s: SparkSession, dir: String) => {
        val pairs = graft.operators.Dedup
          .ngramJaccardPairs(shinglesRaw(docs(s, dir)), "doc_id", "sh", minJac = 0.2)
        graft.operators.Components
          .connectedComponents(s, pairs, "a_id", "b_id")
          .orderBy("id")
      },
      Some(s"$componentsCteSql SELECT id, comp FROM comps ORDER BY id")),

    // Quality-aware canonical selection per duplicate cluster — the
    // decision step that FOLLOWS near-dup detection in every corpus
    // pipeline: of each connected component of the near-dup graph, keep
    // the highest-quality document (longest text; doc_id tiebreak) and
    // record the cluster size. Engine: components + one quality join +
    // a per-cluster window (partitioned by comp — clusters stay
    // distributed); oracle: the same recursive-CTE closure feeding a
    // window. Exact integers throughout.
    ("dedup_canonical",
      (s: SparkSession, dir: String) => {
        val pairs = graft.operators.Dedup
          .ngramJaccardPairs(shinglesRaw(docs(s, dir)), "doc_id", "sh", minJac = 0.2)
        val comp = graft.operators.Components
          .connectedComponents(s, pairs, "a_id", "b_id")
        val quality = docs(s, dir).select(col("doc_id").as("id"), col("n_chars"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("comp").orderBy(col("n_chars").desc, col("id"))
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("comp")
        comp.join(quality, "id")
          .withColumn("rn", row_number().over(wr))
          .withColumn("sz", count(lit(1)).over(wc))
          .filter(col("rn") === 1)
          .select(col("comp"), col("id").as("keep_id"),
            col("n_chars").as("keep_chars"), col("sz"))
          .orderBy("comp")
      },
      Some(s"""$componentsCteSql
               SELECT comp, id AS keep_id, n_chars AS keep_chars,
                      CAST(sz AS BIGINT) AS sz
               FROM (SELECT c.comp, c.id, d.n_chars,
                            ROW_NUMBER() OVER (PARTITION BY c.comp
                              ORDER BY d.n_chars DESC, c.id) AS rn,
                            COUNT(*) OVER (PARTITION BY c.comp) AS sz
                     FROM comps c JOIN documents d ON d.doc_id = c.id) q
               WHERE rn = 1 ORDER BY comp""")),

    // Weight-proportional deterministic sampling (importance sampling):
    // keep probability ∝ min(n_chars, 400)/400 — the corpus-mixing
    // primitive (weight by length/quality score), reproducible on any
    // partitioning or engine because the decision hashes the row id.
    ("sample_weighted",
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling
          .weightedHashSample(docs(s, dir), "doc_id", "n_chars", maxWeight = 400)
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, n_chars FROM documents
               WHERE ${graft.operators.Sampling.weightedSampleSql("doc_id", "n_chars", 400)}
               ORDER BY doc_id""")),

    // Per-source quota cap (RefinedWeb-style per-domain cap): at most
    // k documents survive per source, chosen by deterministic hash
    // order — the anti-boilerplate curation move (no one domain may
    // dominate the corpus). Ranked through the bounded-heap
    // TopKPerGroup operator: map-side partials cap the shuffle at k
    // rows per source per partition, so a corpus-dominating source
    // cannot become a single-task hotspot. Same survivors everywhere.
    ("sample_capped",
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.quotaCap(docs(s, dir), "doc_id", "source", 10)
          .select("doc_id", "source")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, source FROM (
                 SELECT doc_id, source,
                        ROW_NUMBER() OVER (PARTITION BY source
                          ORDER BY ${graft.operators.Sampling.orderKeySql("doc_id")},
                                   doc_id) AS rn
                 FROM documents) WHERE rn <= 10 ORDER BY doc_id""")),

    // Deterministic global shuffle + sharded training export: shard by
    // one Lehmer round (uniform assignment), order WITHIN each shard by
    // an independent second round — a seedless reshuffle of the corpus
    // that reproduces bit-identically on any partitioning or engine
    // (RNG shuffles are not a contract at scale). Judged as the shard
    // manifest: per-shard count, byte volume, and the first document in
    // training order (head_doc proves the within-shard ORDER, not just
    // membership).
    ("sample_shards",
      (s: SparkSession, dir: String) => {
        val sp = graft.operators.Sampling
        // head_doc is `min_by` over the training-order key — a plain
        // map-side-combinable aggregate, NOT a per-shard ranking window
        // (which would sort the whole corpus inside 8 shard partitions
        // to keep row 1). (orderKey, doc_id) is unique per row, so the
        // argmin is deterministic.
        docs(s, dir)
          .withColumn("shard", sp.hashBucketK(col("doc_id"), 8))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            min_by(col("doc_id"),
              struct(sp.orderKey(col("doc_id")), col("doc_id"))).as("head_doc"))
          .orderBy("shard")
      },
      Some(s"""WITH sh AS (
                 SELECT doc_id, n_chars,
                        ${graft.operators.Sampling.hashBucketKSql("doc_id", 8)} AS shard
                 FROM documents),
               p AS (
                 SELECT shard, doc_id, n_chars,
                        ROW_NUMBER() OVER (PARTITION BY shard
                          ORDER BY ${graft.operators.Sampling.orderKeySql("doc_id")},
                                   doc_id) AS pos
                 FROM sh)
               SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                      MIN(CASE WHEN pos = 1 THEN doc_id END) AS head_doc
               FROM p GROUP BY shard ORDER BY shard""")),

    // Per-group z-score outliers (anomaly detection): events whose
    // value sits > 2 sample standard deviations from their type's mean.
    // Exact integer cents sums (the q27/StddevMoney4 contract shape)
    // feed one IEEE formula spelled identically on both engines, so
    // even the |z| > 2 boundary decision is bit-identical — WHILE the
    // sums stay under 2⁵³, which Canonical.exactSumGuard now enforces
    // per group (Σc² grows ~3×10⁹/row here; the judged SFs have >100×
    // headroom, and past the bound the query raises instead of
    // drifting). Stats frame is groups-sized → broadcast back onto the
    // events: two narrow passes, one shuffle (the group-by).
    ("q52_outliers",
      (s: SparkSession, dir: String) => {
        // Round 16: LONG cents instead of per-row round()→DECIMAL +
        // decimal-buffer sums (the q34/q27/q53 fixed-point move; the
        // split-long combine is bit-identical to the old decimal casts
        // to |Σ| < 2⁷³ and the 2⁵³ guard fires far earlier)
        val e = Tables(s, dir, "events")
          .filter(col("value").isNotNull)
          .withColumn("c", graft.Canonical.cents(col("value")))
        val stats = e.groupBy("event_type").agg(
          graft.Canonical.exactLongSumAsDouble(col("c")).as("sc"),
          graft.Canonical.exactLongSumAsDouble(col("c") * col("c")).as("ssq"),
          count(lit(1)).as("n"),
          count(lit(1)).cast("decimal(19,0)").as("ng"),
          max(col("c") * col("c")).cast("decimal(19,0)").as("gmax"))
        val guard = graft.Canonical.exactSumGuard("q52_outliers")
        e.join(stats, "event_type")
          .withColumn("sd", sqrt((col("ssq") - col("sc") * col("sc") / col("n"))
            / (col("n") - lit(1))))
          .withColumn("z", guard(round((col("c").cast("double") - col("sc") / col("n"))
            / col("sd"), 4)))
          .filter(abs(col("z")) > 2.0)
          .select(col("event_id"), col("event_type"), col("z"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS DECIMAL(18,0)) AS c
                FROM events WHERE value IS NOT NULL),
              stats AS (
                SELECT event_type, CAST(SUM(c) AS DOUBLE) AS sc,
                       CAST(SUM(c * c) AS DOUBLE) AS ssq,
                       COUNT(*) AS n
                FROM e GROUP BY event_type)
              SELECT event_id, e.event_type,
                     ROUND((CAST(c AS DOUBLE) - sc / n) /
                           SQRT((ssq - sc * sc / n) / (n - 1)), 4) AS z
              FROM e JOIN stats ON e.event_type = stats.event_type
              WHERE ABS(ROUND((CAST(c AS DOUBLE) - sc / n) /
                              SQRT((ssq - sc * sc / n) / (n - 1)), 4)) > 2.0
              ORDER BY event_id""")),

    // Triangle enumeration over the near-dup pair graph: how clique-y
    // are the duplicate clusters? The classic distributed formulation —
    // edges already oriented a<b, so each triangle a<b<c materializes
    // exactly once from two equi-joins (wedge a–b, b–c, closed by a–c);
    // no orientation/dedup pass, join keys shuffle-hash like any other.
    // At corpus scale the pair graph is orders of magnitude smaller
    // than the corpus, and the join degree is bounded by the near-dup
    // cluster sizes the similarity threshold already caps.
    ("graph_triangles",
      (s: SparkSession, dir: String) => {
        // the pair frame feeds THREE join inputs — persist it so the
        // (expensive) similarity pipeline upstream executes once, not
        // three times; tracked so CorpusPipeline.run / CacheTracker
        // .unpersistAll() can release it (bench/verify clearCache too)
        val pairs = graft.CacheTracker.track(graft.operators.Dedup
          .ngramJaccardPairs(shinglesRaw(docs(s, dir)), "doc_id", "sh", minJac = 0.2)
          .select(col("a_id"), col("b_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // round 16: force the persist — the three triangle inputs are
        // independent map stages that otherwise race to compute the
        // uncached pair pipeline up to 3× within the first action
        pairs.count()
        val e1 = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
        val e2 = pairs.select(col("a_id").as("b"), col("b_id").as("c"))
        val e3 = pairs.select(col("a_id").as("a"), col("b_id").as("c"))
        // merge-pinned: all three inputs read the same cached pair
        // frame whose pre-materialization size estimate is garbage
        // (explode-descended — see Dedup.ngramJaccardPairs); a static
        // broadcast of a graph-scale side must never be the plan
        e1.join(e2.hint("merge"), "b").join(e3.hint("merge"), Seq("a", "c"))
          .select("a", "b", "c")
          .orderBy("a", "b", "c")
      },
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(shl) AS sh FROM ($shinglesSql) s),
               shd AS (SELECT DISTINCT doc_id, sh FROM sh),
               dfq AS (SELECT sh, COUNT(*) AS dfc FROM shd GROUP BY sh),
               shp AS (SELECT shd.doc_id, shd.sh FROM shd
                       JOIN dfq ON shd.sh = dfq.sh WHERE dfq.dfc <= 1000),
               sizes AS (SELECT doc_id, COUNT(*) AS c FROM shp GROUP BY doc_id),
               rawp AS (
                 SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
                 FROM shp a JOIN shp b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY a.doc_id, b.doc_id),
               pairs AS MATERIALIZED (
                 SELECT a_id, b_id FROM rawp
                 JOIN sizes ca ON ca.doc_id = a_id
                 JOIN sizes cb ON cb.doc_id = b_id
                 WHERE ROUND(CAST(shared AS DOUBLE) / (ca.c + cb.c - shared), 4) >= 0.2)
               SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
               FROM pairs e1
               JOIN pairs e2 ON e1.b_id = e2.a_id
               JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
               ORDER BY a, b, c""")),
               // ^ MATERIALIZED is sf1-scale survival, not semantics:
               // the triangle query references `pairs` THREE times and
               // DuckDB would otherwise inline (re-run) the whole
               // shingle/pair prefix per reference — measured 225 s ->
               // 23 s at 50k docs (round 13), same rows at every SF.

    // Deterministic hash-based stratified sampling: row-keyed Lehmer
    // hash, reproducible on any partitioning / cluster / engine (RNG
    // sampling is not a contract at scale).
    ("sample_stratified",
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling
          .stratifiedHashSample(docs(s, dir), "doc_id", "lang",
            Map("en" -> 10, "es" -> 50, "zh" -> 50, "de" -> 25, "fr" -> 25))
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
               WHERE ${graft.operators.Sampling.hashBucketSql("doc_id")} <
                 CASE lang WHEN 'en' THEN 10 WHEN 'es' THEN 50 WHEN 'zh' THEN 50
                           WHEN 'de' THEN 25 WHEN 'fr' THEN 25 ELSE 0 END
               ORDER BY doc_id""")),

    // Decontamination (train/eval overlap): the pre-training hygiene op
    // — eval documents sharing word-3-gram shingles with any train
    // document are flagged with their overlap count. Fully relational:
    // shingle equi-join + distinct + count, no pairwise text compare.
    // Here train = even doc_id, eval = odd (a deterministic split of
    // the corpus standing in for two real corpora).
    ("text_decontaminate",
      (s: SparkSession, dir: String) => {
        val sh = shingles(docs(s, dir))
        val trainSh = sh.filter(col("doc_id") % 2 === 0)
          .select(col("sh")).distinct()
        // merge-pinned: both sides are corpus-scale shingle frames off
        // explodes (estimates meaningless) — SMJ is safe at any size
        sh.filter(col("doc_id") % 2 === 1)
          .join(trainSh.hint("merge"), "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (
                 SELECT DISTINCT doc_id, unnest(shl) AS sh FROM ($shinglesSql) s),
               train AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 2 = 0)
               SELECT e.doc_id, COUNT(*) AS n_shared
               FROM sh e JOIN train t ON e.sh = t.sh
               WHERE e.doc_id % 2 = 1
               GROUP BY e.doc_id ORDER BY e.doc_id""")),

    // PII-style scrubbing: digit runs redacted to a placeholder, with
    // counts of redactions per doc and a fingerprint of the scrubbed
    // text (both engines replace ALL matches — DuckDB needs the 'g'
    // flag; the patterns stay in the regex subset both dialects share).
    ("text_scrub",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_nums"),
            md5(regexp_replace(col("text"), "[0-9]+", "<num>")).as("fp_scrubbed"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums,
                md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS fp_scrubbed
              FROM documents ORDER BY doc_id""")),

    // TF-IDF-style most-characteristic term per doc, ln-free: rank by
    // (term frequency DESC, document frequency ASC, token ASC) — the
    // same ordering ln(tf)·ln(N/df) induces for ties-free data, but
    // all-integer and therefore hash-stable (libm log is not correctly
    // rounded and differs across engines).
    ("text_top_term",
      (s: SparkSession, dir: String) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df_ = toks.select("doc_id", "tok").distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df"), col("tok"))
        // shuffle_hash: df_ is vocab-scale and explode-descended
        tf.join(df_.hint("shuffle_hash"), "tok")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("tok").as("top_tok"), col("tf"), col("df"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
                     WHERE tok <> '' GROUP BY doc_id, tok),
              df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
                     WHERE tok <> '' GROUP BY tok)
              SELECT doc_id, tok AS top_tok, tf, df FROM (
                SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                       ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                          ORDER BY tf.tf DESC, df.df, tf.tok) AS rn
                FROM tf JOIN df ON tf.tok = df.tok) q
              WHERE rn = 1 ORDER BY doc_id""")),

    // BM25 relevance scoring (Robertson/Sparck-Jones, the retrieval
    // scorer behind corpus search and training-data curation): score
    // every document against a fixed 3-term query, top-50. Shape: tf
    // per term via narrow array `filter` off the scan (NO explode —
    // per-doc work is O(|toks|·terms)), one corpus-stats aggregate
    // (N, avgdl, df per term) broadcast back as a single-row cross
    // join (the q11/q24 whitelisted pattern), then one IEEE formula.
    // Determinism: every input to the formula is an exact integer
    // (tf, dl, df, N) or one exact-int division (avgdl); the ONE
    // libm call (ln — not correctly rounded, differs across engines,
    // the text_top_term finding) is rounded to 6 dp IMMEDIATELY, which
    // absorbs last-ulp ln drift unless the true value sits within
    // ~1e-10 of a 6-dp boundary (3 idf values per run; verified green
    // at all three judged SFs by the soak). After that the op sequence
    // is identical add/mul/div (correctly rounded everywhere) + rule-3
    // ROUND(·,4), ordered with a doc_id tiebreak.
    ("text_bm25",
      (s: SparkSession, dir: String) => {
        val terms = Seq("spark", "vector", "merge")
        val d0 = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val d = d0.select(
          col("doc_id") +: size(col("toks")).cast("bigint").as("dl") +:
            terms.zipWithIndex.map { case (t, i) =>
              size(expr(s"filter(toks, t -> t = '$t')"))
                .cast("bigint").as(s"tf${i + 1}")
            }: _*)
        val statCols =
          count(lit(1)).cast("bigint").as("n_docs") +:
            (sum(col("dl")).cast("double") /
              count(lit(1)).cast("double")).as("avgdl") +:
            terms.indices.map(i =>
              sum(when(col(s"tf${i + 1}") > 0, 1).otherwise(0))
                .cast("bigint").as(s"df${i + 1}"))
        val stats = d.agg(statCols.head, statCols.tail: _*)
        def idf(i: Int) = round(
          log((col("n_docs") - col(s"df$i") + lit(0.5)) /
            (col(s"df$i") + lit(0.5)) + lit(1.0)), 6)
        def part(i: Int) =
          idf(i) * col(s"tf$i").cast("double") * lit(2.2) /
            (col(s"tf$i").cast("double") +
              lit(1.2) * (lit(0.25) +
                lit(0.75) * col("dl").cast("double") / col("avgdl")))
        d.crossJoin(stats)
          .select(col("doc_id"), col("dl"),
            col("tf1").as("tf_spark"), col("tf2").as("tf_vector"),
            col("tf3").as("tf_merge"),
            round(part(1) + part(2) + part(3), 4).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(50)
      },
      Some("""WITH d AS (
                SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                       CAST(len(list_filter(toks, t -> t = 'spark')) AS BIGINT) AS tf1,
                       CAST(len(list_filter(toks, t -> t = 'vector')) AS BIGINT) AS tf2,
                       CAST(len(list_filter(toks, t -> t = 'merge')) AS BIGINT) AS tf3
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              s AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
                       CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
                       CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
                       CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
                FROM d)
              SELECT doc_id, dl, tf1 AS tf_spark, tf2 AS tf_vector, tf3 AS tf_merge,
                     ROUND(
                       ROUND(LN((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0), 6)
                         * CAST(tf1 AS DOUBLE) * 2.2
                         / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                     + ROUND(LN((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0), 6)
                         * CAST(tf2 AS DOUBLE) * 2.2
                         / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                     + ROUND(LN((n_docs - df3 + 0.5) / (df3 + 0.5) + 1.0), 6)
                         * CAST(tf3 AS DOUBLE) * 2.2
                         / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 4) AS bm25
              FROM d, s
              ORDER BY bm25 DESC, doc_id LIMIT 50""")),

    // Context-window chunking with overlap (the splitting step of every
    // LLM ingestion pipeline): window W=128 tokens, stride S=64 (50%
    // overlap). Chunk i covers tokens [i·S, i·S+W); docs with ≤W tokens
    // yield exactly one chunk; chunk count 1+⌈(n−W)/S⌉ otherwise —
    // spelled as the integer ceil-div 1+(n−65) div 64 on both engines.
    // Shape: narrow per-row arithmetic off the scan, then ONE explode
    // whose output is the deliverable itself (rows ≈ docs·n/S) — no
    // shuffle at all in production (the ORDER BY is gate-only). Slice
    // end-clamping is Spark's `slice` semantics = DuckDB's inclusive
    // list slice, so the last short chunk matches textually.
    ("text_chunk",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
          .withColumn("nchunks",
            when(col("n") <= 128, lit(1))
              .otherwise(expr("cast(1 + (n - 65) div 64 as int)")))
          .select(col("doc_id"), col("toks"), col("n"),
            explode(expr("sequence(0, nchunks - 1)")).as("cid"))
          .select(
            col("doc_id"),
            col("cid").as("chunk_id"),
            (col("cid") * 64).as("tok_start"),
            least(col("cid") * 64 + 128, col("n")).as("tok_end"),
            expr("concat_ws(' ', slice(toks, cid * 64 + 1, 128))").as("chunk"))
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
               k AS (SELECT doc_id, toks, CAST(len(toks) AS INT) AS n FROM d),
               c AS (SELECT doc_id, toks, n,
                            CASE WHEN n <= 128 THEN 1
                                 ELSE 1 + (n - 65) // 64 END AS nchunks
                     FROM k),
               e AS (SELECT doc_id, toks, n, unnest(range(nchunks)) AS cid0 FROM c)
               SELECT doc_id, CAST(cid0 AS INT) AS chunk_id,
                      CAST(cid0 * 64 AS INT) AS tok_start,
                      CAST(LEAST(cid0 * 64 + 128, n) AS INT) AS tok_end,
                      array_to_string(toks[CAST(cid0 * 64 + 1 AS INT) : CAST(LEAST(cid0 * 64 + 128, n) AS INT)], ' ') AS chunk
               FROM e ORDER BY doc_id, chunk_id""")),

    // Sequence-packing manifest (concat-and-split, the GPT-pretraining
    // packing scheme): within each shard, documents concatenate in
    // doc_id order and split at fixed 2048-token context boundaries.
    // Per doc: its token offset in the shard stream, the first/last
    // context window it lands in, and its position inside the first —
    // everything a loader needs to assemble batches, all exact integer
    // window arithmetic (running sum over the PRECEDING frame). Shards
    // here are the `source` column so the oracle stays relational; at
    // 100 TB you'd shard by hash(doc_id) % K with K ≫ cores — the plan
    // (one hash exchange + per-partition sort, no global funnel) is
    // identical either way.
    ("text_pack",
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        docs(s, dir)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("nt"))
          .withColumn("off", coalesce(sum(col("nt")).over(w), lit(0L)))
          .select(col("source"), col("doc_id"), col("nt"), col("off"),
            expr("off div 2048").as("pack_first"),
            expr("(off + nt - 1) div 2048").as("pack_last"),
            (col("off") % 2048).as("pos_in_pack"))
          .orderBy("source", "doc_id")
      },
      Some("""WITH d AS (SELECT source, doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
               FROM documents),
               o AS (SELECT source, doc_id, nt,
                      CAST(COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
                     FROM d)
               SELECT source, doc_id, nt, off,
                      off // 2048 AS pack_first,
                      (off + nt - 1) // 2048 AS pack_last,
                      off % 2048 AS pos_in_pack
               FROM o ORDER BY source, doc_id""")),

    // Greedy first-fit packing manifest (round 15 — the NON-splitting
    // alternative text_pack's concat-and-split leaves out, now
    // hash-judged via the AnnOracle discipline): the engine side is
    // [[graft.operators.Packing.greedyFirstFit]]'s one-exchange
    // mapPartitions fold, the oracle is [[PackOracle]]'s transparent
    // driver loop embedded as VALUES (see annOracles). The doc_id
    // bound is prefix-closed — greedy placement depends only on
    // smaller ids in the shard — so the slice IS the full run's
    // manifest restricted to it, at every judged scale.
    ("text_pack_greedy",
      (s: SparkSession, dir: String) =>
        graft.operators.Packing.greedyFirstFit(
          docs(s, dir)
            .filter(col("doc_id") < graft.queries.PackOracle.JudgedMaxDocId)
            .withColumn("nt", size(expr(
              "filter(split(text, ' '), w -> w <> '')")).cast("bigint")),
          "source", "doc_id", "nt", cap = graft.queries.PackOracle.JudgedCap)
          .toDF()
          .select(col("shard"), col("docId").as("doc_id"), col("nt"),
            col("packId").as("pack_id"), col("posInPack").as("pos_in_pack"))
          .orderBy("shard", "doc_id"),
      None),

    // Corpus-mixing manifest (Pile/LLaMA-style source weighting): each
    // source gets an epoch multiplier m (percent — 210 = 2.1 epochs,
    // here derived from the source index: 40+17·(idx mod 11), spanning
    // 0.40×–2.10× so the zero-copy, fractional, and multi-epoch paths
    // all fire). A doc yields ⌊m/100⌋ full copies plus one more iff its
    // deterministic hash bucket < m mod 100 — the same Lehmer-hash
    // contract as sample_weighted, so the decision is identical on any
    // partitioning, cluster, or engine. Narrow per-row arithmetic, one
    // explode producing the manifest itself; no shuffle in production.
    ("sample_mix",
      (s: SparkSession, dir: String) =>
        docs(s, dir)
          .select(col("doc_id"), col("source"))
          .withColumn("m",
            expr("40 + 17 * (cast(substring(source, 4) as int) % 11)"))
          .withColumn("ncopies",
            (expr("m div 100") +
              when(graft.operators.Sampling.hashBucket(col("doc_id"))
                < col("m") % 100, 1).otherwise(0)).cast("int"))
          .filter(col("ncopies") > 0)
          .select(col("doc_id"), col("source"), col("m"),
            explode(expr("sequence(1, ncopies)")).as("copy"))
          .orderBy("doc_id", "copy"),
      Some(s"""WITH m AS (
                 SELECT doc_id, source,
                        40 + 17 * (CAST(substr(source, 4) AS INT) % 11) AS m
                 FROM documents),
               c AS (SELECT doc_id, source, m,
                            m // 100 + CASE WHEN ${graft.operators.Sampling.hashBucketSql("doc_id")} < m % 100
                                            THEN 1 ELSE 0 END AS ncopies
                     FROM m)
               SELECT doc_id, source, m, CAST(unnest(range(1, ncopies + 1)) AS INT) AS copy
               FROM c WHERE ncopies > 0 ORDER BY doc_id, copy""")),

    // Temperature-based corpus rebalancing (the multilingual/multi-source
    // sampling scheme of XLM-R/mT5: p_i ∝ c_i^τ, τ=1/2 up-weights
    // low-resource sources): per-language counts → τ=0.5 weights via
    // sqrt — the ONE libm call IEEE-754 REQUIRES to be correctly
    // rounded, so unlike pow/ln it is bit-identical cross-engine —
    // quantized to integer micro-units, then a fixed 100k-doc budget
    // apportioned by largest-remainder (exact integer div/mod; remainder
    // rank tie-broken by language). The apportionment windows are
    // partitionless BY DESIGN: they run over the per-language totals
    // frame, whose cardinality is #languages — bounded by the corpus
    // vocabulary of sources, not by |documents| (whitelisted in
    // PlanAuditSpec with that reason).
    ("sample_temperature",
      (s: SparkSession, dir: String) => {
        val W = org.apache.spark.sql.expressions.Window
        val all = W.partitionBy()
        docs(s, dir)
          .groupBy("lang").agg(count(lit(1)).as("c"))
          .withColumn("w",
            floor(sqrt(col("c").cast("double")) * lit(1000000.0)).cast("long"))
          .withColumn("wsum", sum(col("w")).over(all))
          .withColumn("base", expr("(100000 * w) div wsum"))
          .withColumn("rem", expr("(100000 * w) % wsum"))
          .withColumn("extra", lit(100000L) - sum(col("base")).over(all))
          .withColumn("rn",
            row_number().over(W.orderBy(col("rem").desc, col("lang"))))
          .select(col("lang"), col("c"), col("w"),
            (col("base") + when(col("rn") <= col("extra"), 1L).otherwise(0L))
              .as("target"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
                         FROM documents GROUP BY lang),
               w AS (SELECT lang, c,
                       CAST(FLOOR(SQRT(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
                     FROM c),
               t AS (SELECT lang, c, w, CAST(SUM(w) OVER () AS BIGINT) AS wsum FROM w),
               b AS (SELECT lang, c, w,
                       CAST((100000 * w) // wsum AS BIGINT) AS base,
                       CAST((100000 * w) % wsum AS BIGINT) AS rem
                     FROM t),
               e AS (SELECT lang, c, w, base, rem,
                       CAST(100000 - SUM(base) OVER () AS BIGINT) AS extra,
                       ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rn
                     FROM b)
               SELECT lang, c, w,
                      CAST(base + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS BIGINT) AS target
               FROM e ORDER BY lang""")),

    // Unigram-LM surprisal scoring (the CCNet-style LM quality filter,
    // ln-free): train token counts over the corpus, score each document
    // by its total encoding cost in whole bits — per-token surprisal
    // ⌊log2 N⌋ − ⌊log2 c⌋ computed as length(bin(x))−1, a pure
    // integer/string op both engines share exactly (libm log is not
    // correctly rounded — the text_top_term finding — so the LM is
    // log2-QUANTIZED by contract, not approximated by floats). Shape:
    // one token explode → (doc,tok) tf + vocab count aggs (both
    // map-side-combinable equi-shuffles on token), the single-row
    // total-N cross join (the q11/q24 whitelisted pattern), one
    // re-agg by doc. Final bits/token is one exact-int IEEE division +
    // rule-3 round.
    ("text_perplexity",
      (s: SparkSession, dir: String) => lmSurprisal(docs(s, dir)).orderBy("doc_id"),
      Some(s"$lmSurprisalCteSql SELECT doc_id, nt, bits, bpt FROM d ORDER BY doc_id")),

    // CCNet corpus partitioning (Wenzek et al. 2020): bucket every
    // document into head/middle/tail by PER-LANGUAGE LM-score terciles
    // — the published curation recipe (train on head, drop or
    // down-weight tail), composed from the judged surprisal scorer.
    // ntile(3) over (lang, ORDER BY bpt, doc_id) is deterministic
    // because the score contract is exact and the tiebreak total; the
    // window partitions by language, so buckets stay distributed.
    ("text_ccnet_buckets",
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("bpt"), col("doc_id"))
        lmSurprisal(docs(s, dir))
          .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
          .withColumn("t", ntile(3).over(w))
          .select(col("doc_id"), col("lang"), col("bpt"),
            when(col("t") === 1, "head").when(col("t") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""$lmSurprisalCteSql
               SELECT d.doc_id, doc.lang, d.bpt,
                      CASE NTILE(3) OVER (PARTITION BY doc.lang
                                          ORDER BY d.bpt, d.doc_id)
                        WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
               FROM d JOIN documents doc ON doc.doc_id = d.doc_id
               ORDER BY d.doc_id""")),

    // BPE pair statistics (the statistic tokenizer training maximizes —
    // Sennrich 2016): adjacent character-pair counts over the
    // word-frequency table, weighted by word frequency; top-20 by
    // (count, pair). This is round 1 of [[graft.operators.Bpe.train]]
    // made relational for the hash gate (the full iterative trainer is
    // spec-judged against a driver-side reference — per-merge state is
    // not single-query SQL). Shape: the corpus pass is ONE word count;
    // pair explosion runs on the vocab-sized frame.
    ("text_bpe_pairs",
      (s: SparkSession, dir: String) =>
        graft.operators.Bpe.wordFreqs(docs(s, dir), "text")
          .filter(length(col("word")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
            .as("pair"))
          .groupBy("pair").agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(20),
      Some("""WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
                         FROM (SELECT unnest(string_split(text, ' ')) AS word
                               FROM documents)
                         WHERE word <> '' GROUP BY word),
               p AS (SELECT word, freq, unnest(range(1, len(word))) AS i
                     FROM w WHERE len(word) >= 2)
               SELECT substr(word, CAST(i AS INT), 2) AS pair,
                      CAST(SUM(freq) AS BIGINT) AS n
               FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""")),

    // The FULL ranked BPE merge list (round 15 — the AnnOracle
    // discipline applied to the trainer): the engine side FORCES the
    // batched incremental DISTRIBUTED loop (driverFoldMaxWords = 0),
    // the oracle is [[BpeOracle]]'s transparent textbook full-recount
    // fold embedded as a VALUES relation (see annOracles). The merge
    // list is model-sized by construction (48 rows); only its
    // transport to the judged frame is driver-side — training is the
    // distributed program under test.
    ("text_bpe_merges",
      (s: SparkSession, dir: String) => {
        // batchRounds stays at the default 8 — round 16 measured the
        // alternatives on this row (sf0.1, 3-rep medians): 24 → 10.6 s,
        // 4 → 7.5 s, inline-argmax variants → 8.5-12.1 s, vs 7.3 s
        // here; the loop sits at its construction+execution balance
        // point and the remaining cost is the deliberate price of
        // forcing the distributed trainer (driverFoldMaxWords = 0)
        // through all 48 rounds. The default driver-fold path trains
        // this list in ~0.5 s.
        val tok = graft.operators.Bpe.train(docs(s, dir), "text",
          nMerges = 48, driverFoldMaxWords = 0)
        import s.implicits._
        tok.merges.zipWithIndex
          .map { case ((a, b), i) => ((i + 1).toLong, a, b) }
          .toDF("rank", "a", "b")
          .orderBy("rank")
      },
      None),

    // BPE tokenizer APPLICATION (round 15 — encode judged, closing the
    // last spec-only BPE surface): train once per source generation
    // (cached under the HNSW fingerprint discipline — the tokenizer is
    // model-sized driver state), then `Bpe.encode` tokenizes a bounded
    // doc slice distributed (split → broadcast vocab join → ordered
    // flatten). Oracle: [[BpeOracle.encodeSql]] applies the pieces map
    // its OWN textbook loop finished with (see annOracles).
    ("text_bpe_encode",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
        val tok = LlmOps.synchronized {
          tokCache.getOrElseUpdate(tokKey(s, s"$dir/documents.parquet", 48L),
            graft.operators.Bpe.train(d, "text", nMerges = 48))
        }
        graft.operators.Bpe
          .encode(d.filter(col("doc_id") < 50), "doc_id", "text", tok)
          .orderBy("doc_id", "wpos", "spos")
      },
      None),

    // BPE encode with OUT-OF-VOCABULARY words (round 16 — the real
    // deployment shape: train on a SAMPLE, encode the corpus): the
    // tokenizer trains on even-doc_id docs only, the encoded slice is
    // odd docs with a guaranteed-unseen token appended per doc —
    // "𝄞oov<doc_id>", whose leading U+1D11E MUSICAL SYMBOL G CLEF is
    // a supplementary-plane code point, so the row also hash-judges
    // the code-point symbol contract (a UTF-16 code-unit split would
    // emit two lone-surrogate pieces and diverge from the oracle).
    // Engine: Bpe.encode's LEFT vocab join + initial-symbol fallback
    // (character pieces + </w>). Oracle: [[BpeOracle.encodeOovSql]]'s
    // textbook loop over the same slices with its own code-point
    // fallback.
    ("text_bpe_encode_oov",
      (s: SparkSession, dir: String) => {
        val d = docs(s, dir)
        val tok = LlmOps.synchronized {
          tokCache.getOrElseUpdate(
            tokKey(s, s"$dir/documents.parquet", 0xB0E00DL),
            graft.operators.Bpe.train(
              d.filter(col("doc_id") % 2 === 0), "text", nMerges = 48))
        }
        val enc = d.filter(col("doc_id") % 2 === 1 && col("doc_id") < 50)
          .withColumn("text", concat(col("text"), lit(" 𝄞oov"),
            col("doc_id").cast("string")))
        graft.operators.Bpe.encode(enc, "doc_id", "text", tok)
          .orderBy("doc_id", "wpos", "spos")
      },
      None),

    // Multinomial Naive Bayes language classifier, trained and applied
    // in-engine (the fastText-shaped curation move: cheap supervised
    // scoring at corpus scale) — [[graft.operators.NaiveBayes]] over
    // the deterministic even/odd split text_decontaminate also uses.
    // Scores are exact integers ([[graft.functions.FixedLog2]]:
    // 1/64-bit fixed-point logs, shift/square only), so the argmax is
    // bit-deterministic cross-engine. NOTE the judged corpus draws all
    // five "languages" from one shared vocabulary, so accuracy here is
    // chance by construction — the behavioral contract (perfect
    // classification on a separable corpus) is CurationOpsSpec's.
    ("text_nb_lang",
      (s: SparkSession, dir: String) =>
        graft.operators.NaiveBayes
          .trainScore(docs(s, dir), "doc_id", "text", "lang",
            col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("pred").as("pred_lang"), col("score"))
          .orderBy("doc_id"),
      Some(s"""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
              train AS (
                SELECT t.doc_id, d.lang, t.tok
                FROM t JOIN documents d ON d.doc_id = t.doc_id
                WHERE t.doc_id % 2 = 0),
              c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM train GROUP BY lang, tok),
              nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n
                     FROM c GROUP BY lang),
              v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM c),
              d_in AS (SELECT nl.lang, nl.n + v.v AS x FROM nl, v),
              ${graft.functions.FixedLog2.qlog2CteSql("dq", "d_in", "lang", "x")},
              c_in AS (SELECT lang, tok, c + 1 AS x FROM c),
              ${graft.functions.FixedLog2.qlog2CteSql("cq", "c_in", "lang, tok", "x")},
              tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                     FROM t GROUP BY doc_id, tok),
              sc AS (SELECT tf.doc_id, dp.lang,
                            CAST(SUM(tf.tf * (COALESCE(cm.q, 0) - dp.q))
                                 AS BIGINT) AS score
                     FROM tf CROSS JOIN dqq dp
                     LEFT JOIN cqq cm
                       ON cm.lang = dp.lang AND cm.tok = tf.tok
                     GROUP BY tf.doc_id, dp.lang),
              r AS (SELECT doc_id, lang, score,
                           ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, lang) AS rn
                    FROM sc)
              SELECT doc_id, lang AS pred_lang, score
              FROM r WHERE rn = 1 ORDER BY doc_id""")),

    // DSIR-style importance selection (Xie et al. 2023): hashed-unigram
    // bucket models (B=256) for the target distribution (source src0)
    // vs the raw corpus, per-doc importance log-ratio in 1/64-bit
    // fixed-point integer logs, deterministic top-20 selection. The
    // oracle re-derives the whole program — hash, smoothing, log
    // table, score, selection — from the same constants.
    ("sample_dsir",
      (s: SparkSession, dir: String) =>
        graft.operators.Dsir.importanceTopK(docs(s, dir),
          col("source") === "src0", buckets = 256, k = 20)
          .orderBy(col("score").desc, col("doc_id")),
      Some(graft.operators.Dsir.importanceTopKOracleSql(
        "source = 'src0'", buckets = 256, k = 20))),
  )

  def queries: Map[String, Q] =
    entries.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    entries.collect { case (n, _, Some(o)) => n -> o.stripMargin }.toMap ++
      annOracles

  /** The three training-loop ANN tiers (PQ / IVF+PQ / HNSW) hash-judge
    * against [[AnnOracle]]'s transparent driver-side re-derivation —
    * the expected rows are embedded as a VALUES relation in the DuckDB
    * oracle. Deriving them needs the scale-factor dir, which only the
    * verify harness knows ([[graft.Verify.dump]] announces it via the
    * `graft.oracle.sfDir` system property); outside a verify run the
    * entries are simply absent, as before.
    */
  private def annOracles: Map[String, String] =
    sys.props.get("graft.oracle.sfDir") match {
      case Some(dir) => Map(
        "ann_pq_topk" -> AnnOracle.pqTopKSql(dir),
        "ann_ivfpq_topk" -> AnnOracle.ivfPqTopKSql(dir),
        "ann_hnsw_topk" -> AnnOracle.hnswTopKSql(dir),
        "text_bpe_merges" -> BpeOracle.mergesSql(dir, nMerges = 48),
        "text_bpe_encode" -> BpeOracle.encodeSql(dir, nMerges = 48,
          maxDocId = 50L),
        "text_bpe_encode_oov" -> BpeOracle.encodeOovSql(dir, nMerges = 48,
          maxDocId = 50L),
        "text_pack_greedy" -> PackOracle.manifestSql(dir,
          cap = PackOracle.JudgedCap, maxDocId = PackOracle.JudgedMaxDocId),
        "ann_ivf_index" -> AnnOracle.ivfIndexTopKSql(dir))
      case None => Map.empty
    }
}

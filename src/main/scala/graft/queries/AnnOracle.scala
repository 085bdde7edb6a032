package graft.queries

import scala.collection.mutable

/** DRIVER-SIDE EXACT ORACLES for the three ANN tiers whose training
  * loops are beyond reasonable SQL — PQ (per-subspace Lloyd), IVF+PQ
  * (Lloyd on residuals), and HNSW (a pointer-chasing graph build).
  *
  * Each tier is a DETERMINISTIC INTEGER PROGRAM by construction
  * (micro-unit quantization, exact int64 dots, floored integer means,
  * total-order tie-breaks — see [[graft.operators.ProductQuantizer]] /
  * [[graft.operators.Hnsw]]), so its end-to-end result can be
  * re-derived by a TRANSPARENT sequential fold on the driver: plain
  * arrays and loops, no DataFrames, no shared code with the
  * distributed implementation beyond the published constants. This is
  * the `Bpe.trainDriver` precedent applied to the search tiers — the
  * oracle's answer is embedded as a `VALUES` relation in the DuckDB
  * SQL the correctness gate executes, turning the three former
  * rows-only entries into hash-judged ones.
  *
  * Independence: this file deliberately re-implements the contract
  * semantics in a different style (flat arrays, explicit loops,
  * insertion-bounded result lists) rather than calling into the
  * operator objects, so a bug in the distributed formulation cannot
  * silently agree with itself. The only Spark touched is reading the
  * input parquet.
  *
  * Scale note: this is a CORRECTNESS oracle, not a production path —
  * it is O(corpus) driver memory by design and runs at verify scale
  * (sf ≤ 0.1, ≤ a few thousand vectors).
  */
object AnnOracle {

  /** One corpus vector under the micro-unit contract:
    * `qa(i) = floor(double(emb(i)) · 10⁶)`, `qn = Σ qa²`.
    */
  final case class Vec(id: Long, qa: Array[Long], qn: Long, label: Int)

  /** Read `dir/embeddings.parquet` (the only Spark use), quantized,
    * sorted by vec_id.
    */
  def load(dir: String): Array[Vec] = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .collect()
      .map { r =>
        val emb = r.getSeq[Float](1).toArray
        val qa = emb.map(f => math.floor(f.toDouble * 1000000.0).toLong)
        Vec(r.getLong(0), qa, qa.map(x => x * x).sum, r.getInt(2))
      }
      .sortBy(_.id)
  }

  // ---------- shared integer/IEEE primitives ----------

  private def idot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The single-IEEE-op cosine of the judged contract. */
  private def cosOf(dot: Long, na: Long, nb: Long): Double =
    dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)

  /** xxHash64 of one 64-bit value, seed 42 — Spark's `xxhash64(col)`
    * on a BIGINT input (the seeding order of the PQ trainers). The
    * published XXH64 algorithm specialized to an 8-byte input;
    * AnnOracleSpec pins it equal to Spark's column function.
    */
  private[graft] def xxh64(value: Long, seed: Long = 42L): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    var h = seed + P5 + 8L
    val k = java.lang.Long.rotateLeft(value * P2, 31) * P1
    h ^= k
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Bounded "best `k` by (score desc, id asc)" — the
    * [[graft.plans.TopK]] ordering re-expressed as a sort-and-take
    * over a materialized candidate list (fine at oracle scale).
    */
  private def topBy[T](cand: Seq[(Double, Long, T)], k: Int): Seq[(Double, Long, T)] =
    cand.sortBy { case (s, id, _) => (-s, id) }.take(k)

  // ---------- product quantization (flat PQ) ----------

  /** Per-subspace codebooks as `books(m)(code) = centroid`, 1-based
    * codes in a map (Lloyd can drop empty codes). Mirrors
    * `ProductQuantizer.train`'s spec: seeds are the `ksub`
    * lowest-`xxhash64(vec_id)` vectors' subvectors with code =
    * 1-based rank in that hash order; each round assigns every
    * subvector to the code minimizing `‖c‖² − 2·sv·c` (ties → lowest
    * code) and replaces each surviving code's centroid with the
    * FLOOR-DIVIDED componentwise mean (`(Σx − pmod(Σx, n)) / n`,
    * exact integers).
    */
  private[graft] def trainPq(vecs: Array[(Long, Array[Long])], m: Int,
      ksub: Int, iters: Int): Array[mutable.LinkedHashMap[Int, Array[Long]]] = {
    val dsub = vecs.head._2.length / m
    def sub(qa: Array[Long], mi: Int): Array[Long] =
      java.util.Arrays.copyOfRange(qa, mi * dsub, (mi + 1) * dsub)
    // seeds: ksub lowest (xxhash64(id), id); code = 1-based rank
    val seeds = vecs.map(_._1).sortBy(id => (xxh64(id), id)).take(ksub)
    var books: Array[mutable.LinkedHashMap[Int, Array[Long]]] =
      Array.tabulate(m) { mi =>
        val b = mutable.LinkedHashMap.empty[Int, Array[Long]]
        seeds.zipWithIndex.foreach { case (id, i) =>
          b(i + 1) = sub(vecs.find(_._1 == id).get._2, mi)
        }
        b
      }
    var it = 0
    while (it < iters) {
      val next = Array.fill(m)(mutable.LinkedHashMap.empty[Int, Array[Long]])
      var mi = 0
      while (mi < m) {
        // assign: per vector the argmin code, ties to the lowest code
        val sums = mutable.SortedMap.empty[Int, (Array[BigInt], Long)]
        vecs.foreach { case (_, qa) =>
          val sv = sub(qa, mi)
          var bestCode = -1; var bestDist = Long.MaxValue
          books(mi).foreach { case (code, cm) =>
            val dist = cm.map(x => x * x).sum - 2L * idot(sv, cm)
            if (dist < bestDist || (dist == bestDist && code < bestCode)) {
              bestDist = dist; bestCode = code
            }
          }
          val (sx, n) = sums.getOrElse(bestCode,
            (Array.fill(dsub)(BigInt(0)), 0L))
          var d = 0
          while (d < dsub) { sx(d) += sv(d); d += 1 }
          sums(bestCode) = (sx, n + 1)
        }
        // update: exact floored means; codes nobody chose drop out
        sums.foreach { case (code, (sx, n)) =>
          next(mi)(code) = sx.map { s =>
            val nn = BigInt(n)
            ((s - s.mod(nn)) / nn).toLong
          }
        }
        mi += 1
      }
      books = next
      it += 1
    }
    books
  }

  /** Encode every vector: codes (ordered by subspace) + the
    * reconstruction norm `rn = Σ ‖c_{code_m}‖²` (the consistent ADC
    * cosine denominator).
    */
  private def encodePq(vecs: Array[(Long, Array[Long])],
      books: Array[mutable.LinkedHashMap[Int, Array[Long]]],
      m: Int): Array[(Long, Array[Int], Long)] = {
    val dsub = vecs.head._2.length / m
    vecs.map { case (id, qa) =>
      val codes = new Array[Int](m)
      var rn = 0L
      var mi = 0
      while (mi < m) {
        val sv = java.util.Arrays.copyOfRange(qa, mi * dsub, (mi + 1) * dsub)
        var bestCode = -1; var bestDist = Long.MaxValue
        books(mi).foreach { case (code, cm) =>
          val dist = cm.map(x => x * x).sum - 2L * idot(sv, cm)
          if (dist < bestDist || (dist == bestDist && code < bestCode)) {
            bestDist = dist; bestCode = code
          }
        }
        codes(mi) = bestCode
        rn += books(mi)(bestCode).map(x => x * x).sum
        mi += 1
      }
      (id, codes, rn)
    }
  }

  /** `ann_pq_topk`'s exact expected rows: ADC shortlist (LUT sums over
    * the code table, top-`shortlist` by score desc / id asc), then the
    * exact quantized-cosine re-rank to `k`. (q_id, neighbor_id, rank,
    * cos).
    */
  def pqRows(dir: String, m: Int = 16, ksub: Int = 64, iters: Int = 2,
      k: Int = 5, shortlist: Int = 64,
      maxQueryId: Long = 10L): Seq[(Long, Long, Long, Double)] = {
    val corpus = load(dir)
    val flat = corpus.map(v => (v.id, v.qa))
    val books = trainPq(flat, m, ksub, iters)
    val encoded = encodePq(flat, books, m)
    val byId = corpus.map(v => v.id -> v).toMap
    val dsub = corpus.head.qa.length / m
    corpus.filter(_.id < maxQueryId).sortBy(_.id).flatMap { q =>
      // per-query LUT: lut(m)(code) = dot(q_m, centroid)
      val lut = Array.tabulate(m) { mi =>
        val qsv = java.util.Arrays.copyOfRange(q.qa, mi * dsub, (mi + 1) * dsub)
        books(mi).map { case (code, cm) => code -> idot(qsv, cm) }.toMap
      }
      val scored = encoded.map { case (id, codes, rn) =>
        var adc = 0L; var mi = 0
        while (mi < m) { adc += lut(mi)(codes(mi)); mi += 1 }
        (cosOf(adc, q.qn, rn), id, ())
      }
      val rerank = topBy(scored.toSeq, shortlist).map { case (_, id, _) =>
        val v = byId(id)
        (cosOf(idot(q.qa, v.qa), q.qn, v.qn), id, ())
      }
      topBy(rerank, k).zipWithIndex.map { case ((cos, id, _), i) =>
        (q.id, id, (i + 1).toLong, cos)
      }
    }.toSeq
  }

  // ---------- IVF + PQ (residual coding, IVFADC) ----------

  /** Exact-integer cell centroids of the `label` coarse quantizer:
    * per-component `floor(double(Σx) / n)` (ONE IEEE division + floor
    * — `Similarity.centroidsExactQuantized`'s spelled-out contract).
    */
  private[graft] def cellCentroids(
      corpus: Array[Vec]): mutable.SortedMap[Int, Array[Long]] = {
    val out = mutable.SortedMap.empty[Int, Array[Long]]
    corpus.groupBy(_.label).foreach { case (cell, vs) =>
      val dim = vs.head.qa.length
      val cm = Array.tabulate(dim) { d =>
        var sx = 0L
        vs.foreach(v => sx += v.qa(d))
        math.floor(sx.toDouble / vs.length).toLong
      }
      out(cell) = cm
    }
    out
  }

  /** `ann_ivfpq_topk`'s exact expected rows: residual codebooks (the
    * same Lloyd fold over `qa − centroid(cell)`), per-cell code
    * tables with the decomposed reconstruction norm
    * `rn = ‖c‖² + 2·Σ c_m·r̂_m + Σ ‖r̂_m‖²`, probe the `nprobe` best
    * cells by exact centroid cosine, ADC-score only their rows via
    * `q·c + Σ lut[code_m]`, shortlist, exact re-rank.
    */
  def ivfPqRows(dir: String, m: Int = 16, ksub: Int = 64, iters: Int = 2,
      k: Int = 5, shortlist: Int = 64, nprobe: Int = 3,
      maxQueryId: Long = 10L): Seq[(Long, Long, Long, Double)] = {
    val corpus = load(dir)
    val cents = cellCentroids(corpus)
    val dsub = corpus.head.qa.length / m
    // residual frame, same vec_ids
    val residuals = corpus.map { v =>
      val cm = cents(v.label)
      (v.id, Array.tabulate(v.qa.length)(d => v.qa(d) - cm(d)))
    }
    val books = trainPq(residuals, m, ksub, iters)
    val encoded = encodePq(residuals, books, m)
    // rn = ‖cell centroid‖² + 2·Σ cross + Σ ‖code centroid‖², where
    // cross_m = dot(cell centroid's m-th slice, code centroid)
    val byId = corpus.map(v => v.id -> v).toMap
    val rows = encoded.map { case (id, codes, resNorm) =>
      val cell = byId(id).label
      val ccm = cents(cell)
      var cross = 0L; var mi = 0
      while (mi < m) {
        val csub = java.util.Arrays.copyOfRange(ccm, mi * dsub, (mi + 1) * dsub)
        cross += idot(csub, books(mi)(codes(mi)))
        mi += 1
      }
      val ccn = ccm.map(x => x * x).sum
      (id, cell, codes, ccn + 2L * cross + resNorm)
    }
    corpus.filter(_.id < maxQueryId).sortBy(_.id).flatMap { q =>
      // probes: top-nprobe cells by exact centroid cosine (ties: cell)
      val probed = cents.toSeq.map { case (cell, cm) =>
        val cdot = idot(q.qa, cm)
        val cn = cm.map(x => x * x).sum
        (cosOf(cdot, q.qn, cn), cell.toLong, cdot)
      }
      val probes = topBy(probed, nprobe)
        .map { case (_, cell, cdot) => cell.toInt -> cdot }.toMap
      val lut = Array.tabulate(m) { mi =>
        val qsv = java.util.Arrays.copyOfRange(q.qa, mi * dsub, (mi + 1) * dsub)
        books(mi).map { case (code, cm) => code -> idot(qsv, cm) }.toMap
      }
      val scored = rows.collect {
        case (id, cell, codes, rn) if probes.contains(cell) =>
          var adc = probes(cell); var mi = 0
          while (mi < m) { adc += lut(mi)(codes(mi)); mi += 1 }
          (cosOf(adc, q.qn, rn), id, ())
      }
      val rerank = topBy(scored.toSeq, shortlist).map { case (_, id, _) =>
        val v = byId(id)
        (cosOf(idot(q.qa, v.qa), q.qn, v.qn), id, ())
      }
      topBy(rerank, k).zipWithIndex.map { case ((cos, id, _), i) =>
        (q.id, id, (i + 1).toLong, cos)
      }
    }.toSeq
  }

  // ---------- persistent IVF index (VectorIndex tier) ----------

  /** `ann_ivf_index`'s exact expected rows: the
    * [[graft.operators.VectorIndex]] program re-derived sequentially —
    * k-means seeded by the `nCells` lowest-xxhash64 vectors (cell =
    * 1-based rank in that order), `iters` Lloyd rounds of cosine
    * assignment (ties → lowest cell) and floored exact-integer means
    * (empty cells drop), one final assignment into state, then an
    * `nprobe`-cell search with SELF-MATCHES KEPT (the index contract:
    * an indexed vector queried by itself is rank 1, cos 1).
    *
    * Lloyd rounds train on the `nSample` lowest-(xxhash64, id) vectors
    * once the corpus exceeds `nSample` (the engine's coarse-quantizer
    * sampling, round 16); the final assignment always covers the full
    * corpus.
    */
  def ivfIndexRows(dir: String, nCells: Int = 16, iters: Int = 5,
      k: Int = 5, nprobe: Int = 3,
      maxQueryId: Long = 10L, nSample: Int = 4096)
      : Seq[(Long, Long, Long, Double)] = {
    require(nSample >= nCells, "sample must cover the seed prefix")
    val corpus = load(dir)
    val train =
      if (corpus.length <= nSample) corpus
      else corpus.sortBy(v => (xxh64(v.id), v.id)).take(nSample)
    def cnOf(cm: Array[Long]): Long = cm.map(x => x * x).sum
    def assignOf(v: Vec, cs: mutable.SortedMap[Int, Array[Long]]): Int = {
      // ascending cells + strict improvement = (ccos desc, cell asc)
      var bestCell = -1
      var bestCos = Double.NegativeInfinity
      cs.foreach { case (cell, cm) =>
        val c = cosOf(idot(v.qa, cm), v.qn, cnOf(cm))
        if (c > bestCos) { bestCos = c; bestCell = cell }
      }
      bestCell
    }
    val byId = corpus.map(v => v.id -> v).toMap
    var cents = mutable.SortedMap.empty[Int, Array[Long]]
    train.map(_.id).sortBy(id => (xxh64(id), id)).take(nCells)
      .zipWithIndex.foreach { case (id, i) => cents(i + 1) = byId(id).qa }
    var it = 0
    while (it < iters) {
      val next = mutable.SortedMap.empty[Int, Array[Long]]
      train.groupBy(v => assignOf(v, cents)).foreach { case (cell, vs) =>
        val dim = vs.head.qa.length
        val n = BigInt(vs.length)
        next(cell) = Array.tabulate(dim) { d =>
          var sx = BigInt(0)
          vs.foreach(v => sx += v.qa(d))
          ((sx - sx.mod(n)) / n).toLong
        }
      }
      cents = next
      it += 1
    }
    val assigned: Map[Long, Int] =
      corpus.map(v => v.id -> assignOf(v, cents)).toMap
    corpus.filter(_.id < maxQueryId).sortBy(_.id).flatMap { q =>
      val probed = cents.toSeq.map { case (cell, cm) =>
        (cosOf(idot(q.qa, cm), q.qn, cnOf(cm)), cell.toLong, ())
      }
      val probes = topBy(probed, nprobe).map(_._2.toInt).toSet
      val cand = corpus.collect {
        case v if probes.contains(assigned(v.id)) =>
          (cosOf(idot(q.qa, v.qa), q.qn, v.qn), v.id, ())
      }
      topBy(cand.toSeq, k).zipWithIndex.map { case ((cos, id, _), i) =>
        (q.id, id, (i + 1).toLong, cos)
      }
    }.toSeq
  }

  // ---------- sharded HNSW ----------

  /** One shard's graph: `links(ordinal)(layer)` over the shard's
    * vecId-ASCENDING node array — the deterministic insert order of
    * `Hnsw.buildShard`, whose semantics (geometric level law, beam
    * `efC`, cap `m`/`2m` at layer 0, prune by similarity with id
    * tie-break) are re-derived here with java.util heaps instead of
    * scala PriorityQueues.
    */
  private[graft] def buildShard(nodes: Array[Vec], m: Int,
      efC: Int): (Array[Int], Array[Array[Array[Int]]]) = {
    val n = nodes.length
    val levels = new Array[Int](n)
    val adj = new Array[Array[mutable.ArrayBuffer[Int]]](n)
    var entry = -1

    def levelOf(vecId: Long): Int = {
      var h = vecId * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
      val u = ((h >>> 34) + 0.5) / (1L << 30).toDouble
      math.min(15, (-math.log(u) / math.log(m.toDouble)).toInt)
    }
    def sim(i: Int, j: Int): Double = {
      val (a, b) = (nodes(i), nodes(j))
      if (a.qn == 0L || b.qn == 0L) -1.0
      else cosOf(idot(a.qa, b.qa), a.qn, b.qn)
    }
    def capOf(layer: Int): Int = if (layer == 0) 2 * m else m

    // beam search at one layer: best-ef ordinals by sim to q.
    // cand pops (sim desc, ordinal asc); res evicts (sim asc,
    // ordinal desc); stop when the best candidate is strictly worse
    // than a FULL result set's worst.
    def searchLayer(q: Int, eps: Seq[Int], ef: Int, layer: Int): Seq[Int] = {
      val visited = mutable.HashSet[Int](eps: _*)
      val cand = new java.util.PriorityQueue[(Double, Int)](
        (a: (Double, Int), b: (Double, Int)) => {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else Integer.compare(a._2, b._2)
        })
      // res worst-first: smallest sim, ties largest ordinal
      val res = new java.util.PriorityQueue[(Double, Int)](
        (a: (Double, Int), b: (Double, Int)) => {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else Integer.compare(b._2, a._2)
        })
      eps.foreach { e => val s = sim(q, e); cand.add((s, e)); res.add((s, e)) }
      var break = false
      while (!break && !cand.isEmpty) {
        val (cs, c) = cand.poll()
        if (res.size >= ef && cs < res.peek()._1) break = true
        else adj(c)(layer).foreach { nb =>
          if (!visited(nb)) {
            visited += nb
            val s = sim(q, nb)
            if (res.size < ef || s > res.peek()._1) {
              cand.add((s, nb)); res.add((s, nb))
              if (res.size > ef) res.poll()
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      res.iterator().asScala.toSeq.sortBy(t => (-t._1, t._2)).map(_._2)
    }

    def connect(q: Int, picks: Seq[Int], layer: Int): Unit = {
      adj(q)(layer) ++= picks
      picks.foreach { nb =>
        adj(nb)(layer) += q
        val cap = capOf(layer)
        if (adj(nb)(layer).size > cap) {
          val kept = adj(nb)(layer).distinct
            .sortBy(o => (-sim(nb, o), o)).take(cap)
          adj(nb)(layer).clear(); adj(nb)(layer) ++= kept
        }
      }
    }

    var i = 0
    while (i < n) {
      val lvl = levelOf(nodes(i).id)
      levels(i) = lvl
      adj(i) = Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) entry = i
      else {
        var ep = Seq(entry)
        val entryLvl = levels(entry)
        var l = entryLvl
        while (l > lvl) { ep = searchLayer(i, ep, 1, l).take(1); l -= 1 }
        l = math.min(lvl, entryLvl)
        while (l >= 0) {
          val found = searchLayer(i, ep, efC, l)
          connect(i, found.take(capOf(l)).filterNot(_ == i), l)
          ep = found
          l -= 1
        }
        if (lvl > entryLvl) entry = i
      }
      i += 1
    }
    // persisted adjacency: per layer distinct ordinals in vec_id order
    (levels, adj.map(_.map(buf =>
      buf.distinct.map(o => o).sortBy(o => nodes(o).id).toArray).toArray))
  }

  /** `ann_hnsw_topk`'s exact expected rows: shard by
    * `vec_id mod shards`, build each shard graph, beam each query
    * (greedy descent above layer 0, beam `efS` at layer 0), merge all
    * shards' candidates to the global top-k by (cos desc, id asc),
    * self excluded.
    */
  def hnswRows(dir: String, shards: Int = 4, m: Int = 8, efC: Int = 64,
      k: Int = 5, efS: Int = 64,
      maxQueryId: Long = 10L): Seq[(Long, Long, Long, Double)] = {
    val corpus = load(dir)
    val queries = corpus.filter(_.id < maxQueryId).sortBy(_.id)
    val cand = mutable.Map.empty[Long, mutable.ArrayBuffer[(Double, Long)]]
    queries.foreach(q => cand(q.id) = mutable.ArrayBuffer.empty)
    (0 until shards).foreach { sh =>
      val nodes = corpus.filter(v => Math.floorMod(v.id, shards.toLong) == sh)
        .sortBy(_.id)
      if (nodes.nonEmpty) {
        val (levels, links) = buildShard(nodes, m, efC)
        def qsim(q: Vec, i: Int): Double = {
          val v = nodes(i)
          if (q.qn == 0L || v.qn == 0L) -1.0
          else cosOf(idot(q.qa, v.qa), q.qn, v.qn)
        }
        val entry = nodes.indices.minBy(i => (-levels(i), nodes(i).id))
        queries.foreach { q =>
          def searchLayer(eps: Seq[Int], ef: Int, layer: Int): Seq[Int] = {
            val visited = mutable.HashSet[Int](eps: _*)
            val candQ = new java.util.PriorityQueue[(Double, Int)](
              (a: (Double, Int), b: (Double, Int)) => {
                val c = java.lang.Double.compare(b._1, a._1)
                if (c != 0) c else Integer.compare(a._2, b._2)
              })
            val res = new java.util.PriorityQueue[(Double, Int)](
              (a: (Double, Int), b: (Double, Int)) => {
                val c = java.lang.Double.compare(a._1, b._1)
                if (c != 0) c else Integer.compare(b._2, a._2)
              })
            eps.foreach { e =>
              val s = qsim(q, e); candQ.add((s, e)); res.add((s, e))
            }
            var break = false
            while (!break && !candQ.isEmpty) {
              val (cs, c) = candQ.poll()
              if (res.size >= ef && cs < res.peek()._1) break = true
              else {
                val nbrs =
                  if (layer < links(c).length) links(c)(layer)
                  else Array.emptyIntArray
                nbrs.foreach { nb =>
                  if (!visited(nb)) {
                    visited += nb
                    val s = qsim(q, nb)
                    if (res.size < ef || s > res.peek()._1) {
                      candQ.add((s, nb)); res.add((s, nb))
                      if (res.size > ef) res.poll()
                    }
                  }
                }
              }
            }
            import scala.jdk.CollectionConverters._
            res.iterator().asScala.toSeq.sortBy(t => (-t._1, t._2)).map(_._2)
          }
          var ep = Seq(entry)
          var l = levels(entry)
          while (l > 0) { ep = searchLayer(ep, 1, l).take(1); l -= 1 }
          searchLayer(ep, efS, 0)
            .filter(i => nodes(i).id != q.id)
            .foreach(i => cand(q.id) += ((qsim(q, i), nodes(i).id)))
        }
      }
    }
    queries.flatMap { q =>
      cand(q.id).sortBy { case (s, id) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((cos, id), i) =>
          (q.id, id, (i + 1).toLong, cos)
        }
    }.toSeq
  }

  // ---------- VALUES-relation SQL rendering ----------

  /** The derived rows as a DuckDB relation matching the judged shape
    * `(q_id BIGINT, neighbor_id BIGINT, rank BIGINT, cos DOUBLE)`.
    * Double literals render as STRING→DOUBLE casts, never bare decimal
    * literals: a bare `0.3227449787122503` is DECIMAL in DuckDB, and
    * VALUES unifies the column to the widest scale across ALL rows —
    * at scale 17 the unscaled value exceeds 2⁵³, so the later
    * decimal→double cast rounds TWICE and lands one ulp off the bits
    * `Double.toString` round-trips. The string parse is a single
    * correctly-rounded conversion and keeps the column DOUBLE.
    */
  private def valuesSql(rows: Seq[(Long, Long, Long, Double)]): String = {
    require(rows.nonEmpty, "ANN oracle derived zero rows")
    val vs = rows.map { case (q, n, r, c) =>
      val cs =
        if (c.isNaN) "CAST('nan' AS DOUBLE)"
        else if (c.isPosInfinity) "CAST('inf' AS DOUBLE)"
        else if (c.isNegInfinity) "CAST('-inf' AS DOUBLE)"
        else s"CAST('$c' AS DOUBLE)"
      s"($q, $n, $r, $cs)"
    }.mkString(",\n  ")
    s"""SELECT CAST(q_id AS BIGINT) AS q_id,
       |       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       |       CAST(rank AS BIGINT) AS rank,
       |       CAST(cos AS DOUBLE) AS cos
       |FROM (VALUES
       |  $vs) AS t(q_id, neighbor_id, rank, cos)
       |ORDER BY q_id, rank""".stripMargin
  }

  def pqTopKSql(dir: String): String = valuesSql(pqRows(dir))
  def ivfPqTopKSql(dir: String): String = valuesSql(ivfPqRows(dir))
  def hnswTopKSql(dir: String): String = valuesSql(hnswRows(dir))
  def ivfIndexTopKSql(dir: String): String = valuesSql(ivfIndexRows(dir))
}

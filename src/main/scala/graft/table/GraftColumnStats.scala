package graft.table

import java.util.{Optional, OptionalLong}

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.colstats.{ColumnStatistics, Histogram, HistogramBin}
import org.apache.spark.sql.types._

/** CBO-grade column statistics derived from the log's per-file zone
  * maps — no ANALYZE pass, no data read. Both catalog scans
  * ([[GraftScan]], [[GraftBatchScan]]) report these through DSv2
  * `Statistics.columnStats`, and Spark's `transformV2Stats` turns them
  * into catalyst `ColumnStat`s, so with `spark.sql.cbo.enabled` filter
  * selectivity and join-order estimation see real ranges instead of
  * defaults — at 100 TB the difference between broadcasting the right
  * side and shuffling both.
  *
  * What the metadata can honestly claim:
  *  - min/max: the fold of every (pruned) file's zone map, converted
  *    to the column's CATALYST internal value (days for dates, micros
  *    for timestamps). Conservative under non-refreshed DV masks —
  *    bounds may be wide, never wrong. Strings are skipped: parquet
  *    truncates string bounds and CBO draws no range estimates from
  *    them anyway.
  *  - nullCount: the sum over files (capped at live rows — DV'd files
  *    whose stats predate the mask may overcount).
  *  - distinctCount: only where the log knows it EXACTLY — a column
  *    that is the source of an `identity` partition transform has ndv
  *    = the snapshot's distinct non-null partition values.
  * A column missing stats in ANY file reports nothing — absent
  * statistics are conservative everywhere downstream.
  */
private[table] object GraftColumnStats {
  import GraftTable.AddFile

  private final case class Stat(ndv: OptionalLong, mn: Optional[Object],
      mx: Optional[Object], nulls: OptionalLong,
      hist: Optional[Histogram] = Optional.empty())
      extends ColumnStatistics {
    override def distinctCount(): OptionalLong = ndv
    override def min(): Optional[Object] = mn
    override def max(): Optional[Object] = mx
    override def nullCount(): OptionalLong = nulls
    override def histogram(): Optional[Histogram] = hist
  }

  /** Stored (height, bins) → the V2 histogram shape. */
  private def toHistogram(h: (Double, Seq[(Double, Double, Long)]))
      : Histogram = new Histogram {
    override def height(): Double = h._1
    override def bins(): Array[HistogramBin] = h._2.map { case (l, u, n) =>
      new HistogramBin {
        override def lo(): Double = l
        override def hi(): Double = u
        override def ndv(): Long = n
      }: HistogramBin
    }.toArray
  }

  private def toL(a: Any): Long = a match {
    case n: Number => n.longValue
    case s => s.toString.toLong
  }
  private def toD(a: Any): Double = a match {
    case n: Number => n.doubleValue
    case s => s.toString.toDouble
  }

  /** Stats-primitive → the column's catalyst INTERNAL value. */
  private def internal(dt: DataType, tpe: String, v: Any): Option[Object] =
    (tpe, dt) match {
      case ("i64", LongType | TimestampType | TimestampNTZType) =>
        Some(java.lang.Long.valueOf(toL(v)))
      case ("i64", IntegerType | DateType) =>
        Some(java.lang.Integer.valueOf(toL(v).toInt))
      case ("i64", ShortType) => Some(java.lang.Short.valueOf(toL(v).toShort))
      case ("i64", ByteType) => Some(java.lang.Byte.valueOf(toL(v).toByte))
      case ("f64", DoubleType) => Some(java.lang.Double.valueOf(toD(v)))
      case ("f64", FloatType) =>
        Some(java.lang.Float.valueOf(toD(v).toFloat))
      case _ => None // strings: truncated bounds, no CBO range use
    }

  /** Estimated OUTPUT rows of a scan whose pushed ranges the reader
    * re-applies: per file, live rows × the uniform-density overlap of
    * each range with the file's zone map (independence across
    * columns, the standard CBO assumption). The pushed predicate
    * never survives as a Filter node above a V1-bridged scan — the
    * scan's own estimate is the ONLY place selectivity can live, and
    * without it a `WHERE id <= 10` over a billion-row table plans as
    * a billion-row join input. Floors at 1 row per surviving file —
    * pruning already dropped provably-empty files; never claims zero.
    */
  def estimateRows(files: Seq[AddFile],
      ranges: Seq[GraftTable.Range],
      hists: Map[String, (Double, Seq[(Double, Double, Long)])] = Map.empty)
      : Long =
    if (ranges.isEmpty)
      files.map(f => f.rows - f.dv.map(_.rows).getOrElse(0L)).sum
    else {
      // ranges MERGE per column first (a BETWEEN arrives as two Range
      // objects — intersect their bounds); independence applies only
      // ACROSS columns. A column with a stored equi-height histogram
      // prices its range by the BINS it overlaps (table-level, skew-
      // aware) — but clipped and RENORMALIZED to the SURVIVING files'
      // folded zone-map span: file pruning on the same column already
      // removed the out-of-span row mass, and pricing the full-table
      // histogram on top would charge that selectivity twice (on data
      // clustered by the column the two effects compound into a
      // quadratic underestimate, and sizeInBytes drives STATIC
      // broadcast selection — an underestimate broadcasts a relation
      // that must not be). A span outside every bin (histogram stale
      // vs the current files) falls back to per-file zone-map
      // uniformity; no zone maps at all means the unclipped histogram
      // is the best available claim.
      val byCol = ranges.groupBy(_.col).toSeq
      val priced = byCol.map { case (c, rs) =>
        hists.get(c) match {
          case Some((_, bins)) =>
            survivorSpan(files, c) match {
              case Some((slo, shi)) =>
                clippedHistFrac(bins, rs, slo, shi)
                  .map(Left(_)).getOrElse(Right((c, rs)))
              case None => Left(histFrac(bins, rs))
            }
          case None => Right((c, rs))
        }
      }
      val histSel = priced.collect { case Left(f) => f }.product
      val zoneCols = priced.collect { case Right(p) => p }
      // string columns and merged-POINT predicates price against a
      // declared-NDV sketch (see strOverlapFrac / the equality branch
      // of overlapFrac); resolve each such column's sketches once.
      // The point test runs on MERGED bounds (`k = 5` is one Range,
      // `k >= 5 AND k <= 5` two) and only true points resolve — a
      // plain BETWEEN must not pay O(files) sketch decodes per plan.
      // Equality prices with each file's OWN sketch NDV: the union
      // NDV spans the whole table, so on data CLUSTERED by the key
      // (each file holding few of the table's values) dividing a
      // file's live rows by the union under-prices its match by up to
      // #files× — and this estimate drives static broadcast sizing
      // and the delete.mode=auto DV-vs-CoW crossover. No union
      // fallback: a live file without its own sketch would make the
      // union refuse too (sketchNdv requires every live file), and a
      // zero-live file's selectivity can't move its 1-row floor.
      val ndvFor: Map[String, Map[String, Long]] = zoneCols.collect {
        case (c, rs) if isMergedPoint(files, c, rs) ||
            files.exists(_.stats.get(c).exists(_.tpe == "str")) =>
          c -> fileNdvs(files, c)
      }.toMap
      val zoneRows = files.map { f =>
        val live = f.rows - f.dv.map(_.rows).getOrElse(0L)
        val sel = zoneCols.map { case (c, rs) =>
          overlapFrac(f, c, rs, ndvFor.get(c).flatMap(_.get(f.path)))
        }.product
        math.max(1L, math.round(live * sel))
      }.sum
      math.max(1L, math.round(zoneRows * histSel))
    }

  /** Do the column's ranges MERGE to a single point? Type-aware via
    * the files' stats primitive: numeric columns compare embedded
    * doubles, string columns compare the literals themselves.
    */
  private def isMergedPoint(files: Seq[AddFile], c: String,
      rs: Seq[GraftTable.Range]): Boolean = {
    val los = rs.flatMap(_.lo)
    val his = rs.flatMap(_.hi)
    if (los.isEmpty || his.isEmpty) return false
    if (files.exists(_.stats.get(c).exists(_.tpe == "str")))
      los.map(_.toString).max == his.map(_.toString).min
    else
      try los.map(toD).max == his.map(toD).min
      catch { case _: NumberFormatException => false }
  }

  /** Folded [min, max] of the surviving files' zone maps for `c`;
    * None when any file lacks a usable (non-string) zone map — then
    * the survivors' span is unknown and clipping would be a guess.
    */
  private def survivorSpan(files: Seq[AddFile], c: String)
      : Option[(Double, Double)] = {
    val per = files.map(_.stats.get(c).filter(_.tpe != "str"))
    if (files.isEmpty || per.exists(_.isEmpty)) None
    else Some((per.flatten.map(s => toD(s.min)).min,
      per.flatten.map(s => toD(s.max)).max))
  }

  /** Histogram selectivity restricted to the span actually covered by
    * the surviving files: per-bin mass inside span∩range over per-bin
    * mass inside span (equi-height ⇒ equal bin masses cancel). None
    * when no bin mass lies inside the span — the histogram predates
    * the surviving data and can price nothing.
    */
  private def clippedHistFrac(bins: Seq[(Double, Double, Long)],
      rs: Seq[GraftTable.Range], slo: Double, shi: Double)
      : Option[Double] = {
    if (bins.isEmpty) return Some(1.0)
    val lo = rs.flatMap(_.lo).map(toD)
      .reduceOption((a: Double, b: Double) => math.max(a, b))
    val hi = rs.flatMap(_.hi).map(toD)
      .reduceOption((a: Double, b: Double) => math.min(a, b))
    // a POINT predicate prices by the containing bin's per-value mass
    // (1/binNdv) — zero-width interval math would price every
    // analyzed equality at 0 rows, the broadcast-driving underestimate
    val point = lo.isDefined && lo == hi
    // POINT pricing: a heavy hitter spans MULTIPLE point bins by
    // equi-height construction — every one of them IS the value's
    // mass and all count. A regular bin counts only when NO point bin
    // carries the value (else its mass was isolated into them), and
    // only ONE regular bin counts — a value on a shared boundary of
    // two regular bins must not be double-priced.
    val pointInPointBin = point && bins.exists { case (bl, bh, _) =>
      bl == bh && bl == lo.get && bl >= slo && bl <= shi
    }
    var regularCounted = false
    var inSpan = 0.0
    var inBoth = 0.0
    bins.foreach { case (bl, bh, nb) =>
      if (bl == bh) {
        if (bl >= slo && bl <= shi) {
          inSpan += 1.0
          if (lo.forall(bl >= _) && hi.forall(bl <= _)) inBoth += 1.0
        }
      } else {
        val sl = math.max(bl, slo)
        val sh = math.min(bh, shi)
        if (sh > sl) {
          val spanFrac = (sh - sl) / (bh - bl)
          inSpan += spanFrac
          if (point) {
            val v = lo.get
            if (!pointInPointBin && !regularCounted && v >= sl && v <= sh) {
              inBoth += math.min(spanFrac, 1.0 / math.max(1L, nb))
              regularCounted = true
            }
          } else {
            val rl = math.max(sl, lo.getOrElse(sl))
            val rh = math.min(sh, hi.getOrElse(sh))
            if (rh > rl) inBoth += (rh - rl) / (bh - bl)
          }
        }
      }
    }
    if (inSpan <= 0.0) None
    else Some(math.min(1.0, inBoth / inSpan))
  }

  /** Fraction of rows an intersected range keeps under an equi-height
    * histogram: every bin holds the same row mass, so the estimate is
    * the mean per-bin overlap — 1 for contained bins, the width
    * fraction for partial bins, membership for point bins (lo == hi).
    */
  private def histFrac(bins: Seq[(Double, Double, Long)],
      rs: Seq[GraftTable.Range]): Double = {
    if (bins.isEmpty) return 1.0
    val lo = rs.flatMap(_.lo).map(toD)
      .reduceOption((a: Double, b: Double) => math.max(a, b))
    val hi = rs.flatMap(_.hi).map(toD)
      .reduceOption((a: Double, b: Double) => math.min(a, b))
    val point = lo.isDefined && lo == hi
    if (point) {
      // equality: EVERY point bin equal to v counts (a heavy hitter
      // spans several by equi-height construction); else the first
      // containing regular bin's per-value mass — see clippedHistFrac
      // on both rules
      val v = lo.get
      val pbins = bins.count { case (bl, bh, _) => bl == bh && bl == v }
      if (pbins > 0) return pbins.toDouble / bins.size
      return bins.find { case (bl, bh, _) => bl != bh && v >= bl && v <= bh }
        .map { case (_, _, nb) => (1.0 / math.max(1L, nb)) / bins.size }
        .getOrElse(0.0)
    }
    val per = bins.map { case (bl, bh, _) =>
      if (bl == bh) { // point bin: in range or not
        if (lo.forall(bl >= _) && hi.forall(bl <= _)) 1.0 else 0.0
      } else {
        val l = math.max(bl, lo.getOrElse(bl))
        val h = math.min(bh, hi.getOrElse(bh))
        math.min(1.0, math.max(0.0, (h - l) / (bh - bl)))
      }
    }
    per.sum / bins.size
  }

  private def overlapFrac(f: AddFile, c: String,
      rs: Seq[GraftTable.Range], ndv: Option[Long] = None): Double =
    f.stats.get(c) match {
      case Some(s) if s.tpe != "str" =>
        val mn = toD(s.min)
        val mx = toD(s.max)
        val pLo = rs.flatMap(_.lo).map(toD)
          .reduceOption((a: Double, b: Double) => math.max(a, b))
        val pHi = rs.flatMap(_.hi).map(toD)
          .reduceOption((a: Double, b: Double) => math.min(a, b))
        // degenerate zone FIRST: a single-valued file that survived
        // pruning IS the predicate's value — selectivity 1, even for
        // a point predicate (1/ndv would underestimate it ndv-fold)
        if (!(mx > mn)) 1.0
        // EQUALITY prices 1/ndv — the interval math below gives a
        // point predicate width 0, flooring at 1 row per file: a
        // catastrophic underestimate on low-cardinality keys
        // (`WHERE k = 5` over a million-row file with 10 distinct k
        // really keeps 100k rows) that feeds static broadcast
        // choices. WITHOUT a declared ndv an equality claims NOTHING
        // (1.0): the floor-to-one-row behavior was itself that
        // underestimate, and `delete.mode = auto` bets on this
        // estimate — no claim means no DV bet.
        else if (pLo.isDefined && pLo == pHi)
          ndv.map(n => 1.0 / math.max(1L, n)).getOrElse(1.0)
        else {
          val lo = (mn +: pLo.toSeq).max
          val hi = (mx +: pHi.toSeq).min
          math.min(1.0, math.max(0.0, (hi - lo) / (mx - mn)))
        }
      case Some(s) => strOverlapFrac(s, rs, ndv)
      case _ => 1.0 // no zone map: no claim
    }

  /** Selectivity of string ranges against a file's (possibly
    * writer-TRUNCATED) string zone map. Truncation-safety comes from
    * the 8-byte embedding: parquet truncates bounds at ≥64 bytes, so a
    * truncated bound's FIRST EIGHT bytes are always intact — the
    * embedded lower equals the true embedded min, and `+1.0` on the
    * embedded upper covers every extension of its 8-byte prefix
    * (Iceberg's truncate-and-increment, expressed in embed space).
    * Pure-ASCII guard as in pruning: beyond ASCII the byte order and
    * UTF-16 order can disagree — then no claim.
    *
    *  - EQUALITY (merged lo == hi): interval arithmetic in the sparse
    *    byte space would claim ~0 (a catastrophic underestimate that
    *    mis-drives broadcasts), so equality prices 1/ndv from the
    *    column's declared sketch union, or claims nothing.
    *  - RANGE: embedded-interval fraction, FLOORED at 1/ndv when a
    *    sketch exists (a file that survived pruning overlaps the
    *    range — "at least one distinct value matches").
    */
  private def strOverlapFrac(s: GraftTable.ColStats,
      rs: Seq[GraftTable.Range], ndv: Option[Long]): Double = {
    val los = rs.flatMap(_.lo).map(_.toString)
    val his = rs.flatMap(_.hi).map(_.toString)
    val ascii = (Seq(s.min.toString, s.max.toString) ++ los ++ his)
      .forall(_.forall(_ < 128))
    if (!ascii || (los.isEmpty && his.isEmpty)) return 1.0
    val ndvSel = ndv.map(n => 1.0 / math.max(1L, n))
    val loS = los.sorted.lastOption // tightest lower
    val hiS = his.sorted.headOption // tightest upper
    if (loS.isDefined && loS == hiS) ndvSel.getOrElse(1.0)
    else {
      val mnE = strEmbed(s.min.toString)
      val mxE = strEmbed(s.max.toString) + 1.0
      if (!(mxE > mnE)) return 1.0
      val lo = math.max(mnE, loS.map(strEmbed).getOrElse(mnE))
      val hi = math.min(mxE, hiS.map(strEmbed(_) + 1.0).getOrElse(mxE))
      val frac = math.min(1.0, math.max(0.0, (hi - lo) / (mxE - mnE)))
      ndvSel.map(n => math.max(frac, n)).getOrElse(frac)
    }
  }

  /** Byte-order-preserving embedding of a string's first 8 bytes into
    * a double — monotone wrt parquet's unsigned-byte comparison for
    * pure-ASCII strings (the same guard pruning uses).
    */
  private def strEmbed(s: String): Double = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var v = 0.0
    var i = 0
    while (i < 8) {
      v = v * 256.0 + (if (i < b.length) (b(i) & 0xFF) else 0)
      i += 1
    }
    v
  }

  def of(snap: GraftTable.Snapshot, files: Seq[AddFile],
      required: StructType,
      hists: Map[String, (Double, Seq[(Double, Double, Long)])] = Map.empty)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    if (files.isEmpty) return out
    val liveRows =
      files.map(f => f.rows - f.dv.map(_.rows).getOrElse(0L)).sum
    // exact ndv for identity-partition source columns: the snapshot's
    // distinct non-null encoded partition values
    val identityNdv: Map[String, Long] = snap.spec.collect {
      case t: Partitioning.PIdentity =>
        t.srcCol -> files.flatMap(_.part.get(t.fieldName))
          .filter(_ != Partitioning.NullValue).distinct.size.toLong
    }.toMap
    for (f <- required.fields) {
      val phys = GraftTable.physicalNameOf(snap.schema, f.name)
      // exact identity-layout ndv wins; else the union of the files'
      // HLL sketches (declared via setNdvColumns — mergeable, so the
      // estimate is right on any PRUNED file subset too)
      val ndv: Option[Long] =
        identityNdv.get(f.name).orElse(sketchNdv(files, f.name, phys))
      val per = files.map(af =>
        af.stats.get(f.name).orElse(af.stats.get(phys)))
      if (per.forall(_.isDefined)) {
        val ss = per.map(_.get)
        val tpe = ss.head.tpe
        val nulls = math.min(ss.map(_.nulls).sum, liveRows)
        val mn = ss.map(_.min).reduce((a, b) =>
          if (GraftTable.cmpPublic(tpe, a, b) <= 0) a else b)
        val mx = ss.map(_.max).reduce((a, b) =>
          if (GraftTable.cmpPublic(tpe, a, b) >= 0) a else b)
        val mnI = internal(f.dataType, tpe, mn)
        val mxI = internal(f.dataType, tpe, mx)
        val hist = hists.get(f.name).map(toHistogram)
        out.put(Expressions.column(f.name), Stat(
          ndv.map(OptionalLong.of).getOrElse(OptionalLong.empty()),
          Optional.ofNullable(mnI.orNull),
          Optional.ofNullable(mxI.orNull),
          OptionalLong.of(nulls),
          Optional.ofNullable(hist.orNull)))
      } else ndv.foreach { n =>
        // no zone maps, but the layout/sketches still know ndv
        out.put(Expressions.column(f.name), Stat(OptionalLong.of(n),
          Optional.empty(), Optional.empty(), OptionalLong.empty()))
      }
    }
    out
  }

  /** Each file's OWN per-column HLL estimate — the right denominator
    * for pricing an equality against THAT file's rows. Files without
    * a sketch (or without live rows) are absent.
    */
  private def fileNdvs(files: Seq[AddFile], name: String)
      : Map[String, Long] = {
    import org.apache.datasketches.hll.HllSketch
    files.iterator
      .filter(f => f.rows - f.dv.map(_.rows).getOrElse(0L) > 0)
      .flatMap(f => f.ndv.get(name).map { b64 =>
        f.path -> math.max(1L, math.round(HllSketch.heapify(
          java.util.Base64.getDecoder.decode(b64)).getEstimate))
      })
      .toMap
  }

  /** Union of the files' per-column HLL sketches → NDV estimate; None
    * unless EVERY file with live rows carries one (a file written
    * before `setNdvColumns`, or holding only nulls, makes the union a
    * floor, and a floor presented as an estimate misleads the
    * optimizer more than no claim). Files with ZERO live rows —
    * empty part files, fully-DV-masked files — contribute no values
    * and are exempt, so one empty append can't silence the column.
    */
  private def sketchNdv(files: Seq[AddFile], name: String,
      phys: String): Option[Long] = {
    import org.apache.datasketches.hll.{HllSketch, Union}
    val withRows =
      files.filter(f => f.rows - f.dv.map(_.rows).getOrElse(0L) > 0)
    val per = withRows.map(af =>
      af.ndv.get(name).orElse(af.ndv.get(phys)))
    if (withRows.isEmpty || per.exists(_.isEmpty)) return None
    val u = new Union(HllSketch.DEFAULT_LG_K)
    per.flatten.foreach { b64 =>
      u.update(HllSketch.heapify(
        java.util.Base64.getDecoder.decode(b64)))
    }
    Some(math.max(1L, math.round(u.getResult.getEstimate)))
  }
}

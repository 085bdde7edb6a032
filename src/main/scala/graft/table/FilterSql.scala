package graft.table

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.sources._

/** Translates DataSource-V1 [[org.apache.spark.sql.sources.Filter]]s
  * (the form Spark hands a `SupportsPushDownFilters` /
  * `SupportsDelete` connector) into Spark-SQL predicate TEXT.
  *
  * One translation serves three consumers with guaranteed-identical
  * semantics: the catalog scan's residual filter (evaluated by Spark
  * itself on the inner frame, so the translation cannot drift from
  * the engine), [[GraftTable.rangesOf]] (which re-parses the text into
  * zone-map/bloom pruning ranges — the same path `scanWhere` uses), and
  * [[GraftTable.deleteWhere]]'s copy-on-write predicate.
  *
  * Translation is CONSERVATIVE: any filter (or literal type) outside
  * the supported set returns None and stays Spark-side — never wrong,
  * at worst unpruned.
  */
object FilterSql {

  private val TsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  /** A quoted, injection-safe column reference. Nested fields arrive
    * dotted; each part is backtick-quoted separately.
    */
  private def col(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  /** SQL literal text for a filter value, or None if the type has no
    * safe textual form (binary, arbitrary objects).
    */
  def lit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'")
    case b: Boolean => Some(b.toString)
    case n @ (_: Byte | _: Short | _: Int | _: Long) => Some(n.toString)
    // floats render as their shortest decimal representation, BARE (no
    // CAST wrapper): the text parses as a DECIMAL/scientific literal
    // that [[GraftTable.rangesOf]] can read back into a pruning range
    // (it matches plain Literals only), and shortest-repr → decimal →
    // nearest-binary round-trips to the identical value
    // a float widens to ITS double value (not its decimal text — the
    // comparison runs at double precision, where 1.1f ≠ 1.1)
    case f: Float =>
      if (f.isNaN || f.isInfinite) None else Some(f.toDouble.toString)
    case d: Double =>
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString + "BD")
    case d: BigDecimal => lit(d.underlying)
    case d: java.sql.Date => Some(s"DATE '${d.toLocalDate}'")
    case d: LocalDate => Some(s"DATE '$d'")
    // the trailing Z pins the literal to the instant: Spark re-parses
    // `TIMESTAMP '…'` in the SESSION timezone, and a pushed filter is
    // NOT re-checked by Spark — a zoneless rendering would silently
    // shift the predicate (and a catalog DELETE's victim set) in any
    // non-UTC session
    case t: java.sql.Timestamp =>
      Some(s"TIMESTAMP '${TsFmt.format(t.toInstant)}Z'")
    case i: Instant => Some(s"TIMESTAMP '${TsFmt.format(i)}Z'")
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ columns
      Some(s"TIMESTAMP_NTZ '${t.toLocalDate} ${t.toLocalTime}'")
    case _ => None
  }

  /** The filter as Spark-SQL text, or None if untranslatable. */
  def translate(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => lit(v).map(l => s"${col(a)} = $l")
    case EqualNullSafe(a, v) =>
      if (v == null) Some(s"${col(a)} IS NULL")
      else lit(v).map(l => s"${col(a)} <=> $l")
    case GreaterThan(a, v) => lit(v).map(l => s"${col(a)} > $l")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${col(a)} >= $l")
    case LessThan(a, v) => lit(v).map(l => s"${col(a)} < $l")
    case LessThanOrEqual(a, v) => lit(v).map(l => s"${col(a)} <= $l")
    case In(a, vs) =>
      // a NULL (or untranslatable) value keeps the whole filter
      // Spark-side: dropping a NULL from the list would be exact under
      // a plain filter but flips NULL→true under an enclosing NOT, and
      // translate() is compositional
      if (vs.isEmpty) Some("false")
      else {
        val ls = vs.toSeq.map(lit)
        if (ls.exists(_.isEmpty)) None
        else Some(ls.flatten.mkString(s"${col(a)} IN (", ", ", ")"))
      }
    case IsNull(a) => Some(s"${col(a)} IS NULL")
    case IsNotNull(a) => Some(s"${col(a)} IS NOT NULL")
    case And(l, r) =>
      for (ls <- translate(l); rs <- translate(r)) yield s"($ls AND $rs)"
    case Or(l, r) =>
      for (ls <- translate(l); rs <- translate(r)) yield s"($ls OR $rs)"
    case Not(c) => translate(c).map(s => s"(NOT $s)")
    case StringStartsWith(a, v) =>
      lit(v).map(l => s"startswith(${col(a)}, $l)")
    case StringEndsWith(a, v) => lit(v).map(l => s"endswith(${col(a)}, $l)")
    case StringContains(a, v) => lit(v).map(l => s"contains(${col(a)}, $l)")
    case _: AlwaysTrue => Some("true") // TRUNCATE arrives as this
    case _: AlwaysFalse => Some("false")
    case _ => None // unknown filter kinds: leave Spark-side
  }

  /** Conjunction text of every translatable filter (None if none). */
  def conjunction(filters: Seq[Filter]): Option[String] = {
    val parts = filters.flatMap(translate(_))
    if (parts.isEmpty) None else Some(parts.mkString("(", ") AND (", ")"))
  }
}

package graft.queries

/** DRIVER-SIDE EXACT ORACLE for greedy first-fit sequence packing —
  * the [[AnnOracle]] discipline applied to
  * [[graft.operators.Packing.greedyFirstFit]]: the manifest is a pure
  * sequential fold over (shard, doc order), so it re-derives as a
  * transparent driver loop (sort + linear scan, no shared code with
  * the operator) and embeds as a VALUES relation in the DuckDB
  * oracle.
  *
  * The judged slice is PREFIX-CLOSED: greedy first-fit in ascending
  * doc-id order means a doc's placement depends only on SMALLER ids
  * in its shard, so filtering the input to `doc_id < maxDocId`
  * yields exactly the full run's manifest restricted to those ids —
  * the bound keeps the VALUES relation model-sized at every judged
  * scale without changing any judged row's meaning.
  */
object PackOracle {

  /** Context-window token cap of the judged row (docs average ~54
    * whitespace tokens, so packs hold a couple of docs and both the
    * close-and-open and the oversize paths exercise).
    */
  val JudgedCap = 128L

  /** Judged id bound (prefix-closed, see class doc). */
  val JudgedMaxDocId = 2000L

  /** (shard, doc_id, nt, pack_id, pos_in_pack) rows of the expected
    * manifest over `dir/documents.parquet` with shard = `source` and
    * nt = non-empty whitespace token count.
    */
  def manifestRows(dir: String, cap: Long, maxDocId: Long)
      : Seq[(String, Long, Long, Long, Long)] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map { r =>
        val nt = r.getString(2).split(" ").count(_.nonEmpty).toLong
        (r.getString(0), r.getLong(1), nt)
      }
      .filter(_._2 < maxDocId)
      .sortBy { case (sh, id, _) => (sh, id) }
    val out = Seq.newBuilder[(String, Long, Long, Long, Long)]
    var curShard: String = null
    var packId = 0L
    var used = 0L
    docs.foreach { case (sh, id, nt) =>
      if (sh != curShard) { curShard = sh; packId = 0L; used = 0L }
      if (used > 0L && used + nt > cap) { packId += 1L; used = 0L }
      out += ((sh, id, nt, packId, used))
      used += nt
    }
    out.result()
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The derived manifest as the judged DuckDB relation, ordered by
    * (shard, doc_id).
    */
  def manifestSql(dir: String, cap: Long, maxDocId: Long): String = {
    val rows = manifestRows(dir, cap, maxDocId)
    require(rows.nonEmpty, "packing oracle derived zero rows")
    val vs = rows.map { case (sh, id, nt, p, pos) =>
      s"(${lit(sh)}, $id, $nt, $p, $pos)"
    }.mkString(",\n  ")
    s"""SELECT CAST(shard AS VARCHAR) AS shard,
       |       CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(nt AS BIGINT) AS nt,
       |       CAST(pack_id AS BIGINT) AS pack_id,
       |       CAST(pos_in_pack AS BIGINT) AS pos_in_pack
       |FROM (VALUES
       |  $vs) AS t(shard, doc_id, nt, pack_id, pos_in_pack)
       |ORDER BY shard, doc_id""".stripMargin
  }
}

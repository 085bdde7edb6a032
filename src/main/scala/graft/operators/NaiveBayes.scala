package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedLog2.qlog2

/** Multinomial Naive Bayes text classifier, trained and applied
  * in-engine — the fastText-shaped curation move (cheap supervised
  * scoring over a whole corpus) without leaving the cluster.
  *
  * Scores are EXACT integers: per-token log-likelihoods are
  * [[graft.functions.FixedLog2.qlog2]] fixed-point logs (1/64-bit
  * resolution, bit-identical in Spark and the DuckDB oracle), so the
  * argmax is deterministic under the total (score DESC, label)
  * tiebreak on any partitioning, cluster, or engine.
  *
  * Model: add-one smoothing. `score(doc, L) = Σ_tok tf ·
  * (qlog2(c(L,tok)+1) − qlog2(n(L)+V))` — the standard multinomial NB
  * log-posterior up to the class prior, which is intentionally omitted
  * (corpus-frequency priors are a curation bias: at 100 TB the dominant
  * class would swamp rare-language recall).
  *
  * Shape at scale: one token explode over the corpus, two grouped
  * counts over the MODEL frame (vocab-sized, not corpus-sized), an
  * equi-join of doc-term frequencies against the model, and a
  * #labels-row prior frame broadcast across tokens. The argmax is one
  * `min_by` aggregate (map-side combinable — no per-document window
  * sort). No pairwise anything.
  */
object NaiveBayes {

  /** Train on `docs` rows matching `trainPred`, score EVERY row.
    *
    * @return one row per document with at least one token:
    *         (idCol, pred, score)
    */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column): DataFrame = {
    val id = col(idCol)
    val toks = docs
      .select(id, col(labelCol), col(textCol))
      .withColumn("tok", explode(split(col(textCol), " ")))
      .filter(col("tok") =!= "")
      .select(id, col(labelCol), col("tok"), trainPred.as("is_train"))
    val counts = toks.filter(col("is_train"))
      .groupBy(labelCol, "tok").agg(count(lit(1)).as("c"))
    val nLabel = counts.groupBy(labelCol).agg(sum(col("c")).as("n"))
    val vocab = counts.select("tok").distinct().agg(count(lit(1)).as("v"))
    val prior = nLabel.crossJoin(broadcast(vocab))
      .select(col(labelCol), qlog2(col("n") + col("v")).as("denom_q"))
    val model = counts.select(col(labelCol), col("tok"),
      qlog2(col("c") + 1).as("c_q"))
    val tf = toks.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val scored = tf.crossJoin(broadcast(prior))
      .join(model, Seq(labelCol, "tok"), "left")
      .withColumn("term", col("tf") * (coalesce(col("c_q"), lit(0L)) - col("denom_q")))
      .groupBy(idCol, labelCol)
      .agg(sum(col("term")).as("score"))
    // argmax via one aggregate (map-side combinable; score DESC, label
    // ASC tiebreak — min of (−score, label)) instead of a grouped
    // row_number window, which would sort every (doc, label) row
    // inside per-doc partitions
    scored.groupBy(idCol)
      .agg(min_by(struct(col(labelCol), col("score")),
        struct((-col("score")).as("ns"), col(labelCol))).as("best"))
      .select(id, col(s"best.$labelCol").as("pred"),
        col("best.score").as("score"))
  }
}

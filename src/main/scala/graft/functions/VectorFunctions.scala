package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ArrayType(FloatType)` embeddings.
  * Pure higher-order `Column` expressions (zip_with / aggregate) — codegen
  * path, no UDF, no shuffle; computed in double with sequential
  * ascending-index summation so results are reproducible across engines.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def normSq(a: Column): Column = {
    val ad = asDouble(a)
    aggregate(transform(ad, x => x * x), lit(0.0), _ + _)
  }

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize: pre-normalizing once turns every downstream cosine
    * into a plain dot product — the right layout for repeated ANN probes
    * at scale.
    *
    * The norm is let-bound through a one-element outer transform: HOF
    * lambdas are interpreted with no subexpression elimination, so the
    * naive `transform(ad, x => x / norm)` re-computes the whole norm
    * aggregate once per element (64× overhead at dim 64). Binding it to a
    * lambda variable evaluates it exactly once per row.
    */
  def l2Normalize(a: Column): Column = {
    val ad = asDouble(a)
    val n = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _))
    flatten(transform(array(n), nn => transform(ad, x => x / nn)))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
        lit(0.0),
        _ + _
      )
    )
}

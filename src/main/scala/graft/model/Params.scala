package graft.model

import scala.util.Random

/** Hyperparameter space primitives — the Scala ADT re-expression of
  * the reference's descriptors (reference: src/elastic_surv/models/
  * params.py:23-70): Categorical → uniform choice, Float → uniform in
  * [lo, hi), Integer → choice over an inclusive stepped range.
  * Seeded RNG for deterministic tests.
  */
sealed trait Param {
  def name: String
  def sample(rng: Random): Any
  def bounds: (Any, Any)
}

final case class CategoricalP(name: String, choices: Seq[Any]) extends Param {
  def sample(rng: Random): Any = choices(rng.nextInt(choices.size))
  def bounds: (Any, Any) = (choices.head, choices.last)
}

final case class FloatP(name: String, low: Double, high: Double) extends Param {
  def sample(rng: Random): Any = low + rng.nextDouble() * (high - low)
  def bounds: (Any, Any) = (low, high)
}

final case class IntegerP(name: String, low: Int, high: Int, step: Int = 1)
    extends Param {
  // range(low, high+1, step) — inclusive upper, like params.py:64,69-70
  private def domain: Seq[Int] = low.to(high, step)
  def sample(rng: Random): Any = domain(rng.nextInt(domain.size))
  def bounds: (Any, Any) = (low, high)
}

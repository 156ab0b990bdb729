package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Expression-level let-binding.
  *
  * `Let.bound(e)(body)` compiles to `element_at(transform(array(e), x ->
  * body(x)), 1)`: `e` is evaluated exactly ONCE per row (as the single
  * element of a one-element array) and handed to `body` as a lambda
  * variable — a reference the optimizer cannot substitute an alias into.
  *
  * Why this exists: CollapseProject inlines a projected alias into the
  * consuming expression, and when the consumer references it inside a
  * higher-order-function lambda the inlined expression re-evaluates per
  * ELEMENT — turning a linear in-row pipeline quadratic. Measured here:
  * the CDC boundary scan (sha256 chain re-run per chunk — 158 s → 2.5 s
  * at sf0.1, ChunkDedup) and the winnowing hash array (re-built per
  * window position — the O(len²·k) trap TextOps.winnowPairs previously
  * defeated with a cache barrier). The binding is structural, not a
  * reference-count heuristic: no optimizer rule rewrites
  * element_at-over-transform (SimplifyExtractValueOps fires only on
  * CreateArray), so single evaluation survives any project collapse.
  * Cost: one single-element array allocation per row per binding.
  */
object Let {
  def bound(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}

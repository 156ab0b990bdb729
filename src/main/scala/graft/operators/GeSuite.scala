package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Loader for the Great-Expectations suite JSON the reference's DQ
  * contract ships as (`validation/expectations_prices.json:1-43`) — the
  * declarative file format parses into [[Expectations.Expectation]]s, so a
  * user's existing suite runs against this engine unmodified.
  *
  * Supported expectation types (the ones the reference suite uses):
  *   - `expect_column_to_exist` — schema-level; binds to an all-or-nothing
  *     rule (a missing column flags every row, an audit shows n_total)
  *   - `expect_column_values_to_not_be_null`
  *   - `expect_column_values_to_be_between` — numeric, inclusive bounds,
  *     either side optional; NULL values pass (GE evaluates between over
  *     non-null values only — the not_null expectation owns nulls)
  * Anything else fails fast with the supported list, rather than silently
  * skipping a quality rule.
  */
object GeSuite {

  final case class GeExpectation(
      expectationType: String,
      column: String,
      minValue: Option[Double],
      maxValue: Option[Double]) {

    /** Rule name: `<type-stem>_<column>` (e.g. `between_volume`) — the
      * audit emits `n_viol_<name>` columns, mirroring the hand-authored
      * rules' naming.
      */
    def name: String = {
      val stem = expectationType match {
        case "expect_column_to_exist" => "exists"
        case "expect_column_values_to_not_be_null" => "not_null"
        case "expect_column_values_to_be_between" => "between"
      }
      s"${stem}_$column"
    }

    /** Bind against a concrete frame's schema: checks that need the
      * column fail wholesale when it's absent (GE reports the expectation
      * failed, not an exception).
      */
    def bind(df: DataFrame): Expectations.Expectation = {
      val present = df.columns.contains(column)
      val holds = expectationType match {
        case "expect_column_to_exist" => lit(present)
        case "expect_column_values_to_not_be_null" =>
          if (present) col(column).isNotNull else lit(false)
        case "expect_column_values_to_be_between" =>
          if (!present) lit(false)
          else {
            val bounds = (minValue.map(col(column) >= _).toSeq ++
              maxValue.map(col(column) <= _).toSeq)
              .reduceOption(_ && _).getOrElse(lit(true))
            col(column).isNull || bounds // non-null values only, per GE
          }
      }
      Expectations.Expectation(name, holds)
    }
  }

  final case class Suite(name: String, expectations: Seq[GeExpectation]) {
    def bind(df: DataFrame): Seq[Expectations.Expectation] =
      expectations.map(_.bind(df))

    /** One-row violation-count audit under this suite. */
    def audit(df: DataFrame): DataFrame = Expectations.audit(df, bind(df))
  }

  private val supported = Set(
    "expect_column_to_exist",
    "expect_column_values_to_not_be_null",
    "expect_column_values_to_be_between")

  def parse(json: String): Suite = {
    val root = new ObjectMapper().readTree(json)
    val name = Option(root.get("expectation_suite_name"))
      .map(_.asText).getOrElse("unnamed")
    val exps = Option(root.get("expectations")).toSeq
      .flatMap(n => (0 until n.size).map(n.get))
      .map { e =>
        val etype = e.get("expectation_type").asText
        require(supported.contains(etype),
          s"unsupported expectation_type '$etype' (supported: ${supported.mkString(", ")})")
        val kwargs = e.get("kwargs")
        val column = kwargs.get("column").asText
        // fail-fast contract: a bound we can't evaluate must REJECT the
        // suite, not silently turn a between-expectation into always-pass
        // (GE string/date bounds are unsupported; JSON null = half-open)
        def num(field: String): Option[Double] =
          Option(kwargs.get(field)).filterNot(_.isNull).map { v =>
            require(v.isNumber,
              s"$etype on '$column': $field must be numeric, got $v — " +
                "string/date bounds are unsupported; convert the bound or drop the rule")
            v.asDouble
          }
        GeExpectation(etype, column, num("min_value"), num("max_value"))
      }
    Suite(name, exps)
  }

  def load(path: String): Suite =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Load a suite bundled on the classpath (the engine ships one for the
    * `events` testdata table at `ge/expectations_events.json`).
    */
  def loadResource(resource: String): Suite = {
    val in = getClass.getClassLoader.getResourceAsStream(resource)
    require(in != null, s"classpath resource not found: $resource")
    try parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}

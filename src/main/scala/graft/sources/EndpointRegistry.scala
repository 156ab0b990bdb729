package graft.sources

import org.apache.spark.sql.DataFrame

/** Endpoint registry — the engine-side equivalent of the reference's
  * `ENDPOINTS` config map (`fmp_dump_raw.py:81-113`): one `SourceSpec` per
  * raw feed, carrying the storage-path template and partition scheme that
  * drive the raw-zone NDJSON.gz sink (K2) and the downstream source reads.
  * The HTTP side of each endpoint (url templates, query params, rate
  * limits) is client-side fetch config SURVEY §2.1 scopes out of the
  * engine; what the engine owns is WHERE each feed's bytes live and HOW
  * they partition.
  *
  * Two partition schemes, mirroring the reference layout exactly:
  *   - [[PerSymbol]] (`symbol={symbol}/`): statement-like feeds,
  *     overwritten on each run — no date partition, the latest dump wins
  *     (`test_fmp_dump_raw.py:227-233`);
  *   - [[PerDate]] (`dt={date}/`): market-wide daily feeds, one directory
  *     per day, backfillable over a date range.
  */
object EndpointRegistry {

  sealed trait PartitionScheme
  /** One key per symbol; re-dumped whole (no date partition). */
  case object PerSymbol extends PartitionScheme
  /** One key per date (`dt=`), supports range backfill. */
  case object PerDate extends PartitionScheme

  /** Storage contract of one raw feed. `pathTemplate` is relative to the
    * raw root and must carry exactly the placeholders its scheme implies
    * — checked at construction, so a malformed registry entry fails at
    * startup, not mid-dump (the invariants of
    * `test_fmp_dump_raw.py:196-245`).
    */
  final case class SourceSpec(
      name: String,
      pathTemplate: String,
      scheme: PartitionScheme,
      supportsBackfill: Boolean = false) {
    require(pathTemplate.endsWith(".ndjson.gz"),
      s"$name: raw keys are NDJSON.gz (got $pathTemplate)")
    scheme match {
      case PerSymbol =>
        require(pathTemplate.contains("{symbol}") && pathTemplate.contains("symbol="),
          s"$name: per-symbol endpoints need a symbol= partition")
        require(!pathTemplate.contains("dt="),
          s"$name: per-symbol endpoints carry no date partition (overwritten per run)")
      case PerDate =>
        require(pathTemplate.contains("{date}") && pathTemplate.contains("dt="),
          s"$name: per-date endpoints need a dt= partition")
        require(!pathTemplate.contains("{symbol}"),
          s"$name: per-date endpoints are market-wide, no symbol key")
    }

    /** The reference CLIENT's single-object key under `rawRoot` — what
      * `fmp_dump_raw.py` uploads as one gzipped NDJSON object. This models
      * the reference layout for compatibility checks and migration tooling;
      * it is NOT where the engine sink writes. [[writeRaw]] emits Spark
      * part-files under [[partitionDir]] instead, and [[readRaw]] reads
      * either layout (both live under the same partition directory). Use
      * writeRaw/readRaw for engine I/O; never read back via this key.
      */
    def path(rawRoot: String, symbol: String = null, date: String = null): String = {
      val resolved = scheme match {
        case PerSymbol =>
          require(symbol != null, s"$name resolves per symbol")
          pathTemplate.replace("{symbol}", symbol)
        case PerDate =>
          require(date != null, s"$name resolves per date")
          pathTemplate.replace("{date}", date)
      }
      s"${rawRoot.stripSuffix("/")}/$resolved"
    }

    /** The partition directory shared by the client layout and the engine
      * sink: `path()`'s parent for one symbol/date, the directory
      * [[writeRaw]] fills with part-files.
      */
    def partitionDir(rawRoot: String, symbol: String = null, date: String = null): String = {
      val p = path(rawRoot, symbol, date)
      p.substring(0, p.lastIndexOf('/'))
    }

    /** The Hive-style partition column this spec's layout encodes. */
    def partitionCol: String = scheme match {
      case PerSymbol => "symbol"
      case PerDate => "dt"
    }
  }

  /** The reference's registry, storage side (`fmp_dump_raw.py:81-113`). */
  val endpoints: Map[String, SourceSpec] = Map(
    "owner_earnings" -> SourceSpec("owner_earnings",
      "fmp/owner_earnings/symbol={symbol}/{symbol}-owner-earnings.ndjson.gz", PerSymbol),
    "income" -> SourceSpec("income",
      "fmp/statements/income/symbol={symbol}/{symbol}-income.ndjson.gz", PerSymbol),
    "balance_sheet" -> SourceSpec("balance_sheet",
      "fmp/statements/balance_sheet/symbol={symbol}/{symbol}-balance.ndjson.gz", PerSymbol),
    "cash_flow" -> SourceSpec("cash_flow",
      "fmp/statements/cash_flow/symbol={symbol}/{symbol}-cashflow.ndjson.gz", PerSymbol),
    "treasury_rates" -> SourceSpec("treasury_rates",
      "fmp/treasury_rates/dt={date}/treasury-rates-{date}.ndjson.gz", PerDate,
      supportsBackfill = true))

  /** K2 keyed by the registry: write `df` as partitioned NDJSON.gz under
    * the endpoint's raw layout — the engine-side sink the reference's
    * dump loop keys off the same config
    * (`fmp_dump_raw.py:250-291`). The frame must carry the scheme's
    * partition column (`symbol` or `dt`).
    */
  def writeRaw(df: DataFrame, spec: SourceSpec, rawRoot: String): Unit = {
    require(df.columns.contains(spec.partitionCol),
      s"${spec.name}: frame must carry '${spec.partitionCol}' to partition by")
    val dir = s"${rawRoot.stripSuffix("/")}/" + (spec.scheme match {
      case PerSymbol => spec.pathTemplate.substring(0, spec.pathTemplate.indexOf("/symbol="))
      case PerDate => spec.pathTemplate.substring(0, spec.pathTemplate.indexOf("/dt="))
    })
    graft.sinks.Sinks.ndjsonGz(df, dir, Seq(spec.partitionCol))
  }

  /** Read a feed back from its registry layout (partition column recovered
    * from the directory names).
    */
  def readRaw(spark: org.apache.spark.sql.SparkSession, spec: SourceSpec,
      rawRoot: String): DataFrame = {
    val dir = s"${rawRoot.stripSuffix("/")}/" + (spec.scheme match {
      case PerSymbol => spec.pathTemplate.substring(0, spec.pathTemplate.indexOf("/symbol="))
      case PerDate => spec.pathTemplate.substring(0, spec.pathTemplate.indexOf("/dt="))
    })
    spark.read.option("recursiveFileLookup", "false").json(dir)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graphite / OpenTSDB line-protocol decoders as pure Catalyst column
  * expressions — attach them to any line-shaped source (socket stream,
  * Kafka value, text files). Malformed lines are dropped, mirroring the
  * reference's throw-per-line + catch behavior.
  *
  * References: graphite line decoding at
  * /root/reference/src/riemann/transport/graphite.clj:37-160 (service
  * `;k=v` tags → attributes, NaN metric → nil), OpenTSDB `put` telnet
  * decoding at transport/opentsdb.clj:24-145 (tags → attributes, host
  * tag hoisted, tags appended to service minus host, `service=` tag
  * renamed `servicetag=`).
  */
object LineProtocols {

  /** k=v pair array → map, keeping the LAST pair per duplicate key (the
    * reference's reduce/assoc semantics, graphite.clj:21-29) and
    * splitting each pair on its FIRST '=' only, so values containing
    * '=' or ',' survive intact (a join + str_to_map round-trip corrupts
    * both, and throws on duplicate keys). O(n²) per row over a handful
    * of tags. */
  private def kvMap(pairs: Column): Column = {
    def keyOf(t: Column) = substring_index(t, "=", 1)
    val kept = filter(pairs, (t, i) =>
      !exists(slice(pairs, i + 2, lit(1000000)),
        u => keyOf(u) === keyOf(t)))
    val entries = transform(kept, t => struct(
      keyOf(t).as("key"),
      when(instr(t, "=") > 0,
        t.substr(length(keyOf(t)) + 2, length(t))).as("value")))
    when(size(pairs) > 0, map_from_entries(entries)).otherwise(map())
  }

  /** Wrap one of the [[LineParsers]] expressions around `lineCol` and
    * inline the 0-or-1 result struct: invalid lines vanish inside the
    * Generate (no filter re-evaluates the parse), valid ones expand to
    * the decoder's output columns after the preserved input columns. */
  private def viaParser(lines: DataFrame, lineCol: String,
      mk: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val parsed = ColumnBridge.column(mk(ColumnBridge.expression(col(lineCol))))
    val keep = lines.columns.filter(_ != lineCol).map(col).toIndexedSeq
    lines.select(keep :+ inline(parsed): _*)
  }

  /** Decode `service[;k=v...] metric timestamp` lines.
    * Output: (service, metric, time_s, attributes) — exactly one event
    * per valid line; blank/garbage/extra-field lines dropped.
    *
    * Hot path: the single-pass [[GraphiteParse]] expression;
    * [[decodeGraphiteColumns]] is the column-expression spec of the
    * same semantics, property-checked equal in LineParsersParitySpec. */
  def decodeGraphite(lines: DataFrame, lineCol: String = "line"): DataFrame =
    viaParser(lines, lineCol, GraphiteParse)

  private[graft] def decodeGraphiteColumns(lines: DataFrame,
      lineCol: String = "line"): DataFrame = {
    // split once into materialized columns: every later expression
    // references `_p`/`_h` instead of re-running the regex split per
    // projection (HOF lambdas are interpreted, so repeated subtrees are
    // genuinely re-evaluated)
    lines
      // NOT trim(): Spark's trim strips spaces only, and split() keeps
      // trailing empty tokens — a telnet "\n"- or "\r\n"-terminated
      // line would grow a phantom empty field
      .withColumn("_p",
        split(regexp_replace(col(lineCol), "^\\s+|\\s+$", ""), "\\s+"))
      .filter(size(col("_p")) === 3 && element_at(col("_p"), 1) =!= "")
      .withColumn("_h", split(element_at(col("_p"), 1), ";"))
      .withColumn("service", element_at(col("_h"), 1))
      .withColumn("metric",
        // reference maps "nan" (any case) to nil metric
        when(lower(element_at(col("_p"), 2)) === "nan", lit(null))
          .otherwise(element_at(col("_p"), 2)).try_cast("double"))
      .withColumn("time_s", element_at(col("_p"), 3).try_cast("double")
        .try_cast("long")) // double try_cast: ANSI cast would throw on 1e300/NaN
      .withColumn("attributes", kvMap(slice(col("_h"), 2, 1000)))
      // unparseable metrics drop the line (reference NumberFormatException
      // path); only the literal "nan" maps to a nil metric
      .filter(col("time_s").isNotNull &&
        (col("metric").isNotNull || lower(element_at(col("_p"), 2)) === "nan"))
      .drop("_p", "_h", lineCol)
  }

  /** Decode OpenTSDB `put <metric> <ts> <value> [k=v ...]` lines.
    * host tag → host column; remaining tags → attributes (with
    * `service=` renamed `servicetag=`); tag string minus host appended
    * to the service name; description = raw metric name.
    *
    * Hot path: the single-pass [[OpenTsdbParse]] expression;
    * [[decodeOpenTsdbColumns]] is the column-expression spec of the
    * same semantics, property-checked equal in LineParsersParitySpec. */
  def decodeOpenTsdb(lines: DataFrame, lineCol: String = "line"): DataFrame =
    viaParser(lines, lineCol, OpenTsdbParse)

  private[graft] def decodeOpenTsdbColumns(lines: DataFrame,
      lineCol: String = "line"): DataFrame = {
    lines
      // see decodeGraphite: trim() leaves \r\n, split() keeps the
      // resulting trailing empty token
      .withColumn("_p",
        split(regexp_replace(col(lineCol), "^\\s+|\\s+$", ""), "\\s+"))
      .filter(element_at(col("_p"), 1) === "put" && size(col("_p")) >= 4)
      .filter(!lower(element_at(col("_p"), 3)).contains("nan") &&
        !lower(element_at(col("_p"), 4)).contains("nan"))
      .withColumn("_tags", slice(col("_p"), 5, 1000))
      .withColumn("_nohost", filter(col("_tags"), t => !t.startsWith("host=")))
      .withColumn("description", element_at(col("_p"), 2))
      .withColumn("service",
        when(size(col("_nohost")) > 0,
          concat(col("description"), lit(" "), array_join(col("_nohost"), " ")))
          .otherwise(col("description")))
      .withColumn("time_s", element_at(col("_p"), 3).try_cast("long"))
      .withColumn("metric", element_at(col("_p"), 4).try_cast("double"))
      .withColumn("attributes", kvMap(transform(col("_tags"),
        t => when(t.startsWith("service="),
          concat(lit("servicetag="), t.substr(lit(9), length(t))))
          .otherwise(t))))
      .withColumn("host", element_at(col("attributes"), "host"))
      .withColumn("attributes", map_filter(col("attributes"),
        (k, _) => k =!= "host"))
      .filter(col("time_s").isNotNull && col("metric").isNotNull)
      .drop("_p", "_tags", "_nohost", lineCol)
  }

  /** Encode the event relation back to graphite plaintext lines
    * (the graphite *sink*, reference src/riemann/graphite.clj:116-174:
    * `service metric time`). */
  def encodeGraphite(events: DataFrame): DataFrame =
    events.select(concat_ws(" ",
      col("service"), col("metric").cast("string"),
      col("time_s").cast("string")).as("line"))

  /** `graphite-path-basic` (graphite.clj:65-73): reversed FQDN host
    * segments followed by the space-split service, dot-joined —
    * "foo.bar.com" + "cpu load" → "com.bar.foo.cpu.load". Nil host or
    * service contributes nothing (the reference's empty-split). */
  def graphitePathBasic: Column = {
    val hostParts = when(col("host").isNull, array().cast("array<string>"))
      .otherwise(reverse(split(col("host"), "\\.")))
    val svcParts = when(col("service").isNull, array().cast("array<string>"))
      .otherwise(split(col("service"), " "))
    array_join(concat(hostParts, svcParts), ".")
  }

  /** `graphite-path-percentiles` (graphite.clj:75-87): like basic, but
    * a trailing decimal in the service collapses to its fractional
    * digits — "api latency 0.95" → "api.latency.95". (The reference's
    * replacement fn discards the whole part unconditionally — its
    * `when-not` has no body — so "1.95" also maps to "95"; reproduced
    * faithfully.) */
  def graphitePathPercentiles: Column = {
    val renamed = regexp_replace(col("service"), "(\\d+)\\.(\\d+)$", "$2")
    val hostParts = when(col("host").isNull, array().cast("array<string>"))
      .otherwise(reverse(split(col("host"), "\\.")))
    val svcParts = when(col("service").isNull, array().cast("array<string>"))
      .otherwise(split(renamed, " "))
    array_join(concat(hostParts, svcParts), ".")
  }

  /** `graphite-path-tags fields` (graphite.clj:89-107): the dotted
    * service followed by `;field=value` for each requested field
    * present on the event — "api req" + host=foo, rack=n1 →
    * "api.req;host=foo;rack=n1". */
  def graphitePathTags(fields: Seq[String]): Column = {
    val base = array_join(
      when(col("service").isNull, array().cast("array<string>"))
        .otherwise(split(col("service"), " ")), ".")
    fields.foldLeft(base) { (acc, f) =>
      concat(acc, coalesce(
        when(col(f).isNotNull, concat(lit(s";$f="), col(f))), lit("")))
    }
  }
}

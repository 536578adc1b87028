package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The long-tail alerting integrations (reference `src/riemann/
  * msteams.clj`, `telegram.clj`, `opsgenie.clj`, `victorops.clj`) —
  * each is the reference's payload formatter re-expressed as pure
  * codegen'd columns, with the HTTP client injected like every other
  * sink in [[Sinks]]. Formatting runs distributed; only the final POST
  * leaves the executor. */
object Alerting {

  private def orDash(c: Column) = coalesce(c.cast("string"), lit("-"))
  private def orEmpty(c: Column) = coalesce(c.cast("string"), lit(""))

  // ------------------------------------------------------ Microsoft Teams

  /** One MessageCard section per event (msteams.clj:7-32
    * default-formatter): title "service is state" + the six facts.
    * Nil fields render as JSON nulls exactly like cheshire does. */
  def msteamsSection: Column = struct(
    concat(orEmpty(col("service")), lit(" is "), orEmpty(col("state")))
      .as("title"),
    array(
      struct(lit("Service").as("name"), col("service").as("value")),
      struct(lit("Host").as("name"), col("host").as("value")),
      struct(lit("Metric").as("name"),
        col("metric").cast("string").as("value")),
      struct(lit("State").as("name"), col("state").as("value")),
      struct(lit("Description").as("name"), col("description").as("value")),
      struct(lit("Tags").as("name"),
        array_join(coalesce(col("tags"), array().cast("array<string>")), ", ")
          .as("value"))).as("facts"))

  /** MS Teams incoming-webhook sink (msteams.clj:34-66): each batch
    * partition posts ONE MessageCard whose sections are its events —
    * the reference's events-sequence form. */
  class MsTeamsSink(post: String => Unit) extends Sinks.EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit =
      batch.select(Sinks.cheshireJson(msteamsSection).as("section"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val sections = rows.map(_.getString(0)).mkString(",")
          if (sections.nonEmpty) post(
            """{"@type":"MessageCard","@context":"http://schema.org/extensions",""" +
              """"title":"Riemann Alerting","summary":"Received alerts from Riemann",""" +
              s""""sections":[$sections]}""")
        }
  }

  // ------------------------------------------------------------- Telegram

  /** telegram.clj:9-26: the Markdown (default) and HTML message
    * bodies; nil fields render "-". */
  def telegramText(parseMode: String = "Markdown"): Column = {
    val (b, e) = if (parseMode == "HTML") ("<strong>", "</strong>")
    else ("*", "*")
    concat(
      lit(s"${b}Host:$e "), orDash(col("host")), lit("\n"),
      lit(s"${b}Service:$e "), orDash(col("service")), lit("\n"),
      lit(s"${b}State:$e "), orDash(col("state")), lit("\n"),
      lit(s"${b}Metric:$e "), orDash(col("metric")), lit("\n"),
      lit(s"${b}Description:$e "), orDash(col("description")))
  }

  /** Telegram sendMessage sink (telegram.clj:36-90): one API call per
    * event with (chat_id, parse_mode, text) form params; the bot-token
    * URL is assembled like the reference's `api-url` format. */
  class TelegramSink(token: String, chatId: String,
      parseMode: String = "Markdown",
      post: (String, Map[String, String]) => Unit) extends Sinks.EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      val url = s"https://api.telegram.org/bot$token/sendMessage"
      val (cid, pm) = (chatId, parseMode)
      batch.select(telegramText(parseMode).as("text"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach(r => post(url, Map(
            "chat_id" -> cid, "parse_mode" -> pm, "text" -> r.getString(0))))
        }
    }
  }

  // ------------------------------------------------------------- OpsGenie

  /** opsgenie.clj:21-51 default-body: message "host: [state] service"
    * (important info first — OpsGenie truncates), the five-line
    * description, a deterministic alias over (host, service, sorted
    * tags), user "Riemann", tags. Divergence (documented): the
    * reference's alias is Clojure's `hash` of the ￿-joined
    * string; an alias only needs to be stable and collision-poor, so
    * here it's the first 15 hex chars of md5 over the same joined
    * string — reproducible in any engine. */
  def opsgenieBody: Column = {
    val sep = "￿" // the reference's joiner char (opsgenie.clj:43)
    val joined = concat_ws(sep, col("host"), col("service"),
      array_join(sort_array(coalesce(col("tags"),
        array().cast("array<string>"))), sep))
    Sinks.cheshireJson(struct(
      concat(orEmpty(col("host")), lit(": ["), orEmpty(col("state")),
        lit("] "), orEmpty(col("service"))).as("message"),
      concat(lit("Host: "), orEmpty(col("host")),
        lit(" \nService: "), orEmpty(col("service")),
        lit(" \nState: "), orEmpty(col("state")),
        lit(" \nMetric: "), orEmpty(col("metric")),
        lit(" \nDescription: "), orEmpty(col("description")))
        .as("description"),
      substring(md5(joined), 1, 15).as("alias"),
      lit("Riemann").as("user"),
      coalesce(col("tags"), array().cast("array<string>")).as("tags")))
  }

  /** OpsGenie v2 alerts sink (opsgenie.clj:53-66): create posts the
    * body to /v2/alerts with the GenieKey header; close posts to
    * /v2/alerts/<alias>/close?identifierType=alias. */
  class OpsgenieSink(apiKey: String, close: Boolean = false,
      post: (String, Map[String, String], String) => Unit)
      extends Sinks.EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      val headers = Map("Authorization" -> s"GenieKey $apiKey")
      val doClose = close
      batch.select(opsgenieBody.as("body"))
        .select(col("body"),
          get_json_object(col("body"), "$.alias").as("alias"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach { r =>
            if (doClose) post(
              s"https://api.opsgenie.com/v2/alerts/${r.getString(1)}" +
                "/close?identifierType=alias",
              headers, """{"user":"Riemann"}""")
            else post("https://api.opsgenie.com/v2/alerts", headers,
              r.getString(0))
          }
        }
    }
  }

  // ------------------------------------------------------------ VictorOps

  /** victorops.clj:21-34 format-event: message_type INFO/WARNING/
    * CRITICAL/ACKNOWLEDGEMENT/RECOVERY, entity "host/service", state
    * message "host service is state (metric)". */
  def victoropsBody(messageType: String): Column = Sinks.cheshireJson(struct(
    lit(messageType).as("message_type"),
    concat_ws("/", orEmpty(col("host")), orEmpty(col("service")))
      .as("entity_id"),
    col("time_s").as("timestamp"),
    col("time_s").as("state_start_time"),
    concat(orEmpty(col("host")), lit(" "), orEmpty(col("service")),
      lit(" is "), orEmpty(col("state")),
      lit(" ("), orEmpty(col("metric")), lit(")")).as("state_message"),
    lit(false).as("entity_is_host"),
    lit("riemann").as("monitoring_tool")))

  /** VictorOps generic-integration sink (victorops.clj:36-55): the
    * adapter's five message types are one sink each; URL =
    * endpoint/api-key/routing-key. */
  class VictorOpsSink(apiKey: String, routingKey: String,
      messageType: String, post: (String, String) => Unit)
      extends Sinks.EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      val url = "https://alert.victorops.com/integrations/generic/" +
        s"20131114/alert/$apiKey/$routingKey"
      batch.select(victoropsBody(messageType).as("body"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach(r => post(url, r.getString(0)))
        }
    }
  }
}

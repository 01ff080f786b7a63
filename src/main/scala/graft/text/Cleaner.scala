package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boilerplate removal for web-scraped corpora: HTML tag stripping, URL
  * removal, whitespace normalisation. Like [[PiiRedact]], every pattern
  * stays inside the java.regex ∩ RE2 intersection so any engine replays
  * the cleanup; all row-local and codegen'd — no shuffle.
  */
object Cleaner {

  val HtmlTag = "<[^>]*>"
  val Url = "https?://[A-Za-z0-9./?=&_~#%-]+"
  val Ws = "\\s+"

  def stripHtml(c: Column): Column = regexp_replace(c, HtmlTag, " ")

  def stripUrls(c: Column): Column = regexp_replace(c, Url, " ")

  /** Collapse whitespace runs and trim. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(c, Ws, " "))

  /** Full boilerplate pass: tags → URLs → whitespace. Tags first (their
    * attributes may contain URLs that the tag rule removes wholesale).
    */
  def clean(c: Column): Column = normalizeWs(stripUrls(stripHtml(c)))
}

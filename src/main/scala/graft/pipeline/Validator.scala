package graft.pipeline

import java.text.{ParseException, SimpleDateFormat}
import java.util.{Date, TimeZone}

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Validation / normalization semantics of the reference's Validator +
  * DateWrapper + JsonUtils + IdUtility, re-expressed as pure Scala
  * functions over Jackson trees (Jackson ships with Spark; nulls are
  * serialized by default, matching the reference's
  * `GsonBuilder().serializeNulls()` — reference: app/batch/Validator.kt:29).
  *
  * The pipeline calls [[Validator.validate]] from a UDF — a JSON-tree
  * rewrite is genuinely opaque to Catalyst (SURVEY §7.3), so a UDF is
  * the honest physical form; everything around it stays columnar.
  */
object Validator {

  private val mapper = new ObjectMapper()

  val LastModifiedField = "_lastModifiedDateTime"
  val CreatedField = "createdDateTime"
  val RemovedField = "_removedDateTime"
  val ArchivedField = "_archivedDateTime"
  val DateField = "$date"
  val Epoch = "1980-01-01T00:00:00.000Z"

  /** Reference accepts exactly two timestamp shapes
    * (Validator.kt:24-27). */
  val IncomingFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSZZZZ"
  val OutgoingFormat = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  // Full-match regexes gating date parsing (DateWrapper.kt:101-107).
  private val incomingRe: Regex =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}\+\d{4}""".r
  private val outgoingRe: Regex =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z""".r

  // SimpleDateFormat is not thread-safe; executors run many task
  // threads, so formatters are per-thread. Output is pinned to UTC for
  // determinism (the reference formats in the JVM default zone, UTC in
  // its deployment).
  private def fmt(pattern: String): SimpleDateFormat = {
    val f = new SimpleDateFormat(pattern)
    f.setTimeZone(TimeZone.getTimeZone("UTC"))
    // leniency deliberately left at the SimpleDateFormat default, like
    // the reference — a regex-gated rolled-over date wraps, not skips
    f
  }
  private val formats = ThreadLocal.withInitial[(SimpleDateFormat, SimpleDateFormat)](
    () => (fmt(IncomingFormat), fmt(OutgoingFormat)))

  /** Dual-format fallback parse (Validator.kt:153-163); throws
    * ParseException when neither format matches. */
  def parseValidDateTime(s: String): Date = {
    val (in, out) = formats.get()
    try in.parse(s)
    catch {
      case _: Exception =>
        try out.parse(s)
        catch {
          case _: Exception => throw new ParseException(
            s"Unparseable date found: '$s', did not match any supported date formats", 0)
        }
    }
  }

  /** Reformat any accepted timestamp to the outgoing
    * `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'` shape (Validator.kt:165-170). */
  def formatToOutgoing(s: String): String =
    formats.get()._2.format(parseValidDateTime(s))

  /** Regex-gated parse used by the recursive wrapper
    * (DateWrapper.kt:89-99): None when the string is not date-shaped. */
  private def parsedDate(s: String): Option[Date] = s match {
    case incomingRe() => Some(formats.get()._1.parse(s))
    case outgoingRe() => Some(formats.get()._2.parse(s))
    case _ => None
  }

  /** Manifest timestamp preference flips with snapshot type
    * (Validator.kt:172-193): full prefers createdDateTime, incremental
    * prefers _lastModifiedDateTime; parse failure falls back. */
  def timestampAsLong(createdDateTime: String, lastModifiedDateTime: String,
      snapshotType: String): Long = {
    val (preferred, fallback) =
      if (snapshotType == "full") (createdDateTime, lastModifiedDateTime)
      else (lastModifiedDateTime, createdDateTime)
    try parseValidDateTime(preferred).getTime
    catch { case _: ParseException => parseValidDateTime(fallback).getTime }
  }

  // --------------------------------------------------- canonical JSON

  /** Key-sorted (top level only) compact serialization — the
    * reference's id canonicalization (app/utils/JsonUtils.kt:7-14 uses
    * Klaxon `toSortedMap`, which sorts only the outer object). */
  def sortJsonByKey(unsorted: String): String = {
    val node = mapper.readTree(unsorted).asInstanceOf[ObjectNode]
    val sorted = mapper.createObjectNode()
    node.fieldNames().asScala.toSeq.sorted.foreach { k =>
      sorted.set[JsonNode](k, node.get(k))
    }
    mapper.writeValueAsString(sorted)
  }

  /** Recover (originalId, canonicalId) from the printable row-key JSON
    * when the payload has no `_id` (app/utils/IdUtility.kt:7-18). */
  def reverseEngineerId(hbaseIdJson: String): (String, String) = {
    val node = mapper.readTree(hbaseIdJson).asInstanceOf[ObjectNode]
    val scalar = node.size() == 1 && node.has("id")
    if (scalar) {
      val id = node.get("id").asText()
      val oid = mapper.createObjectNode()
      oid.put(OidField, id)
      (id, sortJsonByKey(mapper.writeValueAsString(oid)))
    } else {
      val sorted = sortJsonByKey(mapper.writeValueAsString(node))
      (sorted, sorted)
    }
  }
  val OidField = "$oid"

  // ------------------------------------------------- recursive wrapper

  /** Recursive `$date` wrapping (app/utils/DateWrapper.kt:11-107):
    * every date-shaped string anywhere in the tree (incl. arrays)
    * becomes `{"$date": <outgoing-format>}`; existing one-key
    * `{"$date": primitive}` objects are reformatted in place. The
    * top-level `_lastModifiedDateTime` is skipped when
    * `includeLastModified=false` (the validator wraps it itself). */
  def wrapDatesInTree(obj: ObjectNode, includeLastModified: Boolean = true): Unit = {
    obj.fieldNames().asScala.toSeq
      .filter(k => k != LastModifiedField || includeLastModified)
      .foreach { key => processElement(obj, key, obj.get(key)) }
  }

  private def isMongoDateObject(n: JsonNode): Boolean =
    n != null && n.isObject && n.size() == 1 && n.get(DateField) != null &&
      n.get(DateField).isValueNode

  private def processElement(parent: ObjectNode, key: String, child: JsonNode): Unit =
    child match {
      case c if isMongoDateObject(c) => processMongoDate(c.asInstanceOf[ObjectNode])
      case c: ObjectNode => wrapDatesInTree(c)
      case c: ArrayNode => processArray(c)
      case c if c != null && c.isTextual =>
        parsedDate(c.asText()).foreach { d =>
          parent.set[JsonNode](key, dateObject(d))
        }
      case _ => ()
    }

  private def processMongoDate(dateObj: ObjectNode): Unit = {
    val ts = dateObj.get(DateField).asText()
    parsedDate(ts).foreach { d =>
      dateObj.remove(DateField)
      dateObj.put(DateField, formats.get()._2.format(d))
    }
  }

  private def processArray(arr: ArrayNode): Unit =
    (0 until arr.size()).foreach { i =>
      arr.get(i) match {
        case v: ObjectNode => wrapDatesInTree(v)
        case v: ArrayNode => processArray(v)
        case v if v.isTextual =>
          parsedDate(v.asText()).foreach(d => arr.set(i, dateObject(d)))
        case _ => ()
      }
    }

  private def dateObject(d: Date): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put(DateField, formats.get()._2.format(d))
    o
  }

  // ------------------------------------------------------ field logic

  /** `$date`-aware field fetch (Validator.kt:131-151). */
  def retrieveDateTimeElement(key: String, obj: ObjectNode): String = {
    val el = obj.get(key)
    if (el == null || el.isNull) ""
    else if (el.isObject) {
      val sub = el.get(DateField)
      if (sub != null && !sub.isNull) sub.asText() else ""
    } else el.asText()
  }

  /** Fallback chain `_lastModifiedDateTime` → `_removedDateTime` →
    * `createdDateTime` → epoch (Validator.kt:114-129). */
  def retrieveLastModifiedDateTime(obj: ObjectNode): String = {
    val lm = retrieveDateTimeElement(LastModifiedField, obj)
    val rm = retrieveDateTimeElement(RemovedField, obj)
    val cr = retrieveDateTimeElement(CreatedField, obj)
    if (lm.trim.nonEmpty) lm
    else if (rm.trim.nonEmpty) rm
    else if (cr.trim.nonEmpty) cr
    else Epoch
  }

  private def replaceWithKeyValuePair(obj: ObjectNode, keyToReplace: String,
      newKey: String, value: String): Unit = {
    val n = mapper.createObjectNode()
    n.put(newKey, value)
    obj.remove(keyToReplace)
    obj.set[JsonNode](keyToReplace, n)
  }

  private def elementAsString(n: JsonNode): String =
    if (n.isObject) sortJsonByKey(mapper.writeValueAsString(n))
    else n.asText()

  // ------------------------------------------------------ entry point

  final case class Manifest(id: String, timestamp: Long, db: String,
      collection: String, source: String, outerSource: String,
      innerSource: String, originalId: String)

  final case class Validated(doc: String, manifest: Manifest)

  /** Manifest timestamp for one record. `full` snapshots stamp the
    * cell timestamp — the reference's PRODUCTION path for every
    * snapshot type (ManifestRecord always carries `item.timestamp`,
    * Validator.kt:53/60). For `incremental` this implements the
    * reference's `timestampAsLong` preference order (Validator.kt:
    * 172-193) — document `_lastModifiedDateTime` first, then
    * `createdDateTime`, then the cell ts — which the reference defines
    * and tests but never wires into its production manifest; we adopt
    * it deliberately (the envelope's lastModified flows through
    * SourceRecord for exactly this purpose), so incremental manifests
    * here are a documented DIVERGENCE from reference production
    * output, not exact parity. */
  def manifestTimestamp(obj: ObjectNode, cellTimestamp: Long,
      snapshotType: String): Long =
    if (snapshotType == "full") cellTimestamp
    else {
      val created = retrieveDateTimeElement(CreatedField, obj)
      val lastMod = retrieveDateTimeElement(LastModifiedField, obj)
      try timestampAsLong(created, lastMod, snapshotType)
      catch { case _: ParseException => cellTimestamp }
    }

  /** Full validation/normalization of one decrypted document
    * (Validator.kt:31-69): parse → wrap `_lastModifiedDateTime` (always
    * added, from the fallback chain) → recursive date wrap → drop
    * `_archivedDateTime` when `_removedDateTime` present → scalar `_id`
    * to `{"$oid"}` → manifest record (canonical ids; missing `_id`
    * reverse-engineered from the row key). Returns Left(reason) for the
    * skip side-channel (BadDecryptedDataException semantics).
    * `snapshotType` flips the manifest timestamp preference
    * (Validator.kt:172-193 — see [[manifestTimestamp]]).
    */
  def validate(decrypted: String, hbaseIdJson: String, cellTimestamp: Long,
      db: String, collection: String, outerType: String,
      innerType: String, snapshotType: String = "full"): Either[String, Validated] =
    try {
      val parsed = mapper.readTree(decrypted)
      if (parsed == null || !parsed.isObject)
        Left(s"not a JSON object")
      else {
        val obj = parsed.asInstanceOf[ObjectNode]

        // manifest ts reads the RAW document fields, pre-wrap
        val manifestTs = manifestTimestamp(obj, cellTimestamp, snapshotType)

        // wrapDates (Validator.kt:79-95)
        val lastModified = retrieveLastModifiedDateTime(obj)
        replaceWithKeyValuePair(obj, LastModifiedField, DateField,
          formatToOutgoing(lastModified))
        wrapDatesInTree(obj, includeLastModified = false)

        if (obj.has(ArchivedField) && obj.has(RemovedField))
          obj.remove(ArchivedField)

        val manifest = Option(obj.get("_id")) match {
          case Some(idEl) =>
            val originalId = elementAsString(idEl)
            if (idEl.isValueNode)
              replaceWithKeyValuePair(obj, "_id", OidField, idEl.asText())
            val newId = elementAsString(obj.get("_id"))
            Manifest(newId, manifestTs, db, collection, "EXPORT",
              outerType, innerType, originalId)
          case None =>
            val (original, altered) = reverseEngineerId(hbaseIdJson)
            Manifest(altered, manifestTs, db, collection, "EXPORT",
              outerType, innerType, original)
        }
        Right(Validated(mapper.writeValueAsString(obj), manifest))
      }
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.getClass.getName))
    }
}

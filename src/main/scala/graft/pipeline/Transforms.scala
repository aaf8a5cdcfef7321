package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Topic-specific document transforms:
  *
  *  - businessAudit (db=data, collection=businessAudit): lift the
  *    `context` object out of the decrypted document, stamping
  *    AUDIT_EVENT / TIME_STAMP / TIME_STAMP_ORIG from `auditType` and
  *    the envelope's `_lastModifiedDateTime`
  *    (reference: app/batch/DecryptionProcessor.kt:24-31,59-73).
  *    Runs between decrypt and validate.
  *
  *  - equality (topic=data.equality): re-wrap the sanitised document as
  *    `{"message": {...doc, "@type": innerType}}`
  *    (reference: app/batch/TransformationProcessor.kt:21-46).
  *    Runs after sanitise, just before the sink.
  */
object Transforms {

  val BusinessAuditDb = "data"
  val BusinessAuditCollection = "businessAudit"
  val EqualityTopic = "data.equality"

  private val mapper = new ObjectMapper()

  /** businessAudit context lift; Left(reason) when auditType/context
    * are missing (→ DecryptionFailureException semantics: the record
    * is skipped). */
  def businessAudit(decrypted: String, messageLastModified: String): Either[String, String] =
    try {
      val obj = mapper.readTree(decrypted).asInstanceOf[ObjectNode]
      val context = obj.get("context")
      val auditType = obj.get("auditType")
      if (auditType == null || auditType.isNull || context == null ||
          context.isNull || !context.isObject)
        Left("auditType or context for business audit record is null")
      else {
        val ctx = context.asInstanceOf[ObjectNode]
        ctx.put("AUDIT_EVENT", auditType.asText())
        ctx.put("TIME_STAMP", messageLastModified)
        ctx.put("TIME_STAMP_ORIG", messageLastModified)
        Right(mapper.writeValueAsString(ctx))
      }
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.getClass.getName))
    }

  /** equality re-wrap: `{"message": {...doc, "@type": innerType}}`.
    * `innerType` is the manifest's externalInnerSource
    * (TransformationProcessor.kt:37-40). */
  def equalityWrap(doc: String, innerType: String): String = {
    val inner = mapper.readTree(doc).asInstanceOf[ObjectNode]
    inner.put("@type", innerType)
    val outer = mapper.createObjectNode()
    outer.set[ObjectNode]("message", inner)
    mapper.writeValueAsString(outer)
  }
}

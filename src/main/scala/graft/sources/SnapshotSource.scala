package graft.sources

import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Crypto, KeyService, SnapshotWriter}

/** Distributed re-import of a [[graft.pipeline.SnapshotWriter]] export
  * — the read side of the snapshot format (what the reference
  * ecosystem's snapshot-sender / re-ingest consumers do with the
  * written objects; HTME itself only writes).
  *
  * Each task handles whole snapshot objects: `binaryFile` lists and
  * ships the rolled chunks (each ≤ the writer's `maxBatchBytes`, so a
  * chunk is a bounded unit of work), the task reads the object's
  * metadata sidecar, unwraps its data key through the [[KeyService]]
  * (services memoize per executor — one unwrap per distinct key per
  * JVM, the q40 contract), and streams
  * decrypt → decompress → line-split. Parallelism = number of
  * objects, which the writer sized for exactly this property.
  *
  * Driver-side [[SnapshotWriter.readBack]] stays the golden-test
  * seam; this is the scale path (nothing touches the driver but file
  * listings). Local `File` access mirrors the writer's own sink; a
  * real object store swaps the open/read calls behind the same
  * metadata contract (iv + wrapped key + key id in the sidecar).
  */
object SnapshotSource {

  /** One row per exported line: (file, line). */
  def read(s: SparkSession, outputDir: String, compression: String,
      keys: KeyService): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.enc")
      .load(outputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = new java.io.File(new java.net.URI(path))
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val meta = mapper.readTree(java.nio.file.Files.readString(
          new java.io.File(file.getParentFile,
            s"${file.getName}.metadata.json").toPath))
        val dekPlain = keys.decryptKey(
          meta.get("dataKeyEncryptionKeyId").asText(),
          meta.get("ciphertext").asText())
        val cipher = Crypto.decryptingCipher(dekPlain,
          Base64.getDecoder.decode(meta.get("iv").asText()))
        val in = SnapshotWriter.decompressor(compression,
          new javax.crypto.CipherInputStream(
            new java.io.ByteArrayInputStream(bytes), cipher))
        val text = new String(in.readAllBytes(), "UTF-8")
        in.close()
        text.split("\n", -1).toSeq.filter(_.nonEmpty)
          .map(l => (file.getName, l))
      }
      .toDF("file", "line")
  }
}

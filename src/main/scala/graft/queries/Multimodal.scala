package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2c M1): media payloads are opaque
  * `binary` columns travelling next to a typed metadata struct. Here the
  * payload is the document's UTF-8 bytes (the container has no image/audio
  * codecs — see graft.operators.Multimodal for the batch decode plumbing
  * with its stubbed decoder); the query proves the binary column path:
  * construct payload + metadata struct, then compute size and digest over
  * the bytes.
  */
object Multimodal {

  val m01 = QueryDef(
    "m01_binary_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  source AS kind
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val withPayload = Tables(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(lit("text/plain").as("mime"), col("lang"), col("source")).as("meta"))
    withPayload
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("meta.source").as("kind"))
      .orderBy("doc_id")
  }

  val queries: Seq[QueryDef] = Seq(m01)
}

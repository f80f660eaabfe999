package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Multimodal plumbing: media as opaque `binary` columns with typed
  * metadata. The testdata has no real media files, so the binary
  * payload is the utf-8 encoding of `documents.text` — the Spark-side
  * plumbing (schema, batch shape, partition-local decode) is real;
  * the *decode* itself is a deterministic stub (graft.multimodal).
  */
object MultimodalQueries {

  private val qMeta = Q("q_multimodal_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_height,
      |  hex(encode(substr(text, 1, 4))) AS magic
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bin = col("text").cast("binary")
    val n = length(bin).cast("long")
    t(s, d, "documents").select(
      col("doc_id"),
      n.as("n_bytes"),
      (n % 640).cast("int").as("fake_width"),
      ((n * 7) % 480).cast("int").as("fake_height"),
      hex(substring(col("text"), 1, 4).cast("binary")).as("magic"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(qMeta)
}

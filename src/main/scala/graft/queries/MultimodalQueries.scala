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

  /** The partition-local batch-decode path (MediaPipeline
    * .extractFeatures over mapPartitions — the Scala analog of a
    * mapInPandas decode stage): binary payloads → typed feature rows.
    * Spark-only: the stub decoder's byte loop isn't worth a SQL twin;
    * MultimodalSpec pins exact feature values instead, and the driver
    * records the rows-only check. */
  private val qFeatures = Q.sparkOnly("q_multimodal_features") { (s, d) =>
    import graft.multimodal.MediaPipeline
    MediaPipeline.extractFeatures(s, MediaPipeline.toMedia(t(s, d, "documents")))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        round(col("brightness"), 6).as("brightness"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(qMeta, qFeatures)
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Multimodal plumbing: media as opaque `binary` columns with typed
  * metadata, decoded partition-locally with a REAL codec
  * (`javax.imageio.ImageIO`). Test media are deterministic synthetic
  * grayscale PNGs derived from `doc_id`
  * ([[graft.multimodal.MediaPipeline.synthPng]]), so the oracle can
  * recompute every decoded statistic from the generating formula in
  * pure SQL — certifying the encode→decode round trip without DuckDB
  * ever parsing a PNG.
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
    * mapInPandas decode stage): synthesize a real PNG per document,
    * decode it back with ImageIO, emit per-image channel statistics.
    * The oracle recomputes width/height/brightness/min/max from the
    * synthetic images' closed form (pixel i of doc j is
    * (j·31 + i) mod 256), so a hash match proves the JVM encode →
    * binary column → decode → feature path is pixel-exact. Integer
    * sums throughout; ONE double division at the end, rounded to 6 dp
    * identically on both engines. */
  private val qFeatures = Q("q_multimodal_features",
    """WITH px AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 13 + 4 AS INT) AS width,
      |    CAST(doc_id % 7 + 3 AS INT) AS height,
      |    unnest(range(0, (doc_id % 13 + 4) * (doc_id % 7 + 3))) AS i
      |  FROM documents),
      |v AS (SELECT doc_id, width, height, (doc_id * 31 + i) % 256 AS v FROM px)
      |SELECT doc_id, width, height,
      |  round(CAST(sum(v) AS DOUBLE) / (width * height * 255.0), 6) AS brightness,
      |  CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
      |FROM v GROUP BY doc_id, width, height
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.multimodal.MediaPipeline
    MediaPipeline.extractFeatures(s, MediaPipeline.toMediaPng(s, t(s, d, "documents")))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(col("brightness"), 6).as("brightness"),
        col("px_min"), col("px_max"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(qMeta, qFeatures)
}

package graft

/** Dev tool: scale-up validation for the dedup pipeline (the ScaleProbe
  * analog for the documents path). Runs q_dedup_minhash and
  * q_dedup_pipeline against each given directory and reports docs/s —
  * confirming the LSH candidate path scales near-linearly (its
  * shuffles carry (doc_id, long) pairs, never text).
  * Usage: runMain graft.DedupScaleProbe <dir> [dir...]
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    args.foreach { dir =>
      val nDocs = Tables(spark, dir, "documents").count()
      // q_dedup_simhash_pairs output IS its candidate density (banded
      // candidates post-verify): out growing ∝ true near-dup pairs —
      // not ∝ docs² — is the banding working at scale
      Seq("q_dedup_minhash", "q_dedup_pipeline", "q_dedup_simhash_pairs")
        .foreach { q =>
          val fn = SparkEntry.queries(q)
          fn(spark, dir).count() // warm
          val t0 = System.nanoTime()
          val rows = fn(spark, dir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"DEDUPSCALE dir=$dir%-24s q=$q%-22s docs=$nDocs%8d " +
            f"out=$rows%8d time=$secs%6.2f s rate=${nDocs / secs}%,.0f docs/s")
        }
    }
    spark.stop()
  }
}

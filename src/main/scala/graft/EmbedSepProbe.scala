package graft

/** Dev tool: print the SGNS separation margin (mean co-occurring
  * cosine vs mean hash-random-pair cosine — the corpus-level `sep_ok`
  * verdict) for both embedding queries at a given SF. Diagnoses the
  * statistical verdict at scales outside the driver gate. Usage:
  * runMain graft.EmbedSepProbe <sfDir> */
object EmbedSepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(logLevel = "ERROR")
    for (biased <- Seq(false, true)) {
      val raw =
        if (biased) graft.queries.GraphQueries.biasedWalkPairsOf(spark, sfDir)
        else graft.queries.GraphQueries.walkPairsOf(spark, sfDir)
      val (pairs, emb, sepFrame) =
        graft.queries.GraphQueries.sgnsTrainAndSep(spark, raw)
      val nPairs = pairs.count()
      val nNodes = emb.count()
      val r = sepFrame.head()
      val co = r.getDouble(0)
      if (r.isNullAt(1))
        println(f"EMBEDSEP biased=$biased%-5s nodes=$nNodes%5d pairs=$nPairs%7d " +
          f"co=$co%.6f rn=NULL (no negative pair - clique corpus, vacuous)")
      else {
        val rn = r.getDouble(1)
        println(f"EMBEDSEP biased=$biased%-5s nodes=$nNodes%5d pairs=$nPairs%7d " +
          f"co=$co%.6f rn=$rn%.6f margin=${co - rn}%+.6f sep_ok=${co > rn}")
      }
    }
    spark.stop()
  }
}

package graft.queries

/** Brute-force reference for [[Dedup.qDedupSpanRewrite]], shared by the
  * sf-corpus recompute spec and the adversarial property test — ONE
  * definition of the keeper/excision semantics so the two specs cannot
  * silently drift apart.
  */
object SpanRewriteReference {

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** First 14 hex chars of md5 as a long — TextOps.hash56's contract. */
  def h56(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 14), 16)

  /** docId → (n_tokens, n_removed, md5 of the reassembled kept text):
    * a K-window is kept only in its lowest-doc_id holder; every
    * occurrence elsewhere marks its K positions for removal.
    */
  def expected(docs: Map[Long, Vector[String]],
      k: Int): Map[Long, (Long, Long, String)] = {
    val keeper = scala.collection.mutable.Map.empty[Long, Long]
    docs.toSeq.sortBy(_._1).foreach { case (id, toks) =>
      toks.sliding(k).filter(_.size == k).foreach { w =>
        val h = h56(w.mkString(" "))
        if (!keeper.contains(h) || keeper(h) > id) keeper(h) = id
      }
    }
    docs.map { case (id, toks) =>
      val covered = scala.collection.mutable.BitSet.empty
      toks.sliding(k).zipWithIndex.foreach { case (w, i) =>
        if (w.size == k && keeper(h56(w.mkString(" "))) != id)
          (i until i + k).foreach(covered += _)
      }
      val kept = toks.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((toks.size.toLong, (toks.size - kept.size).toLong,
        md5Hex(kept.mkString(" "))))
    }
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** Dev-only bridge exposing the package-private candidate generator to
  * `graft.tools.ProfileCC` (profiling; not part of the query surface). */
object SimilarityProfileAccess {
  def detCandidates(docs: DataFrame): (DataFrame, () => Unit) =
    Similarity.minhashDetCandidatesWithRelease(docs)
}

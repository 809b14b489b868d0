package graft

/** Scale-extension operators: the trained-IVF ANN must actually retrieve
  * most of what exact search finds (recall, not just determinism — the
  * oracle gate already pins determinism). */
class OpsSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("trained-IVF recall@3 against exact search") {
    val exact = SparkEntry.queries("q50_knn_brute")(spark, sf).collect()
      .filter(_.getAs[Int]("rnk") <= 3)
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("did")).toSet).toMap
    val ivf = SparkEntry.queries("q51_knn_ivf")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("did")).toSet).toMap
    assert(ivf.keySet === exact.keySet)
    val recalls = exact.map { case (q, ex) => (ivf(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@3 was $mean — centroid training regressed")
  }
}

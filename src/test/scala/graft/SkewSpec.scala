package graft

import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join on a skewed fact") {
    // 1000 rows of hot key 1, a few of others
    val fact = ((1 to 1000).map(i => (1L, s"v$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("dk", "name")

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select("k", "payload", "name").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 1001) // hot key matched + k=2; k=3/dk=4 unmatched
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Salted

/** Salting must be invisible in results: salted join == plain join
  * row-for-row on skewed data; two-phase agg == direct agg.
  */
class SaltedSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "HOT", i, i * 1.5)
  }.toDF("k", "id", "v")
  private lazy val dim = (0 until 50).map(i => (s"k$i", s"name$i"))
    .toDF("k", "name").union(Seq(("HOT", "hotname")).toDF("k", "name"))

  test("saltedJoin == plain join (inner, skewed left)") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "id", "v", "name").collect().map(_.toSeq).toSet
    val salted = Salted.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "id", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain && plain.nonEmpty)
  }

  test("saltedJoin == plain join (left outer, unmatched keys keep nulls)") {
    val sparseDim = dim.filter(col("k") =!= "HOT")
    val plain = skewed.join(sparseDim, Seq("k"), "left")
      .select("k", "id", "name").collect().map(_.toSeq).toSet
    val salted = Salted.saltedJoin(skewed, sparseDim, Seq("k"), 8, "left")
      .select("k", "id", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("twoPhaseAgg == direct holistic aggregate") {
    val direct = skewed.groupBy(col("k"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val salted = Salted.twoPhaseAgg(skewed, Seq("k"), factor = 8,
        phase1 = Seq(collect_set(col("id")).as("part")),
        phase2 = Seq(sort_array(array_distinct(flatten(collect_list(col("part")))))
          .as("ids")))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(salted === direct && direct("HOT").size === 1800)
  }

  test("salting is deterministic (no rand): same result across runs") {
    val a = Salted.saltedJoin(skewed, dim, Seq("k"), 8).collect().map(_.toSeq).toSet
    val b = Salted.saltedJoin(skewed, dim, Seq("k"), 8).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}

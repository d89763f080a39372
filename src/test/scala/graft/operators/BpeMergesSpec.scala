package graft.operators

import graft.SparkSpec

class BpeMergesSpec extends SparkSpec {

  private val Sent1 = 1.toChar.toString // sentinel symbol for merge 1

  private def corpus(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
  }

  private def merges(df: org.apache.spark.sql.DataFrame, k: Int) =
    BpeMerges.learn(spark, df, "t", k)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))

  test("picks the most frequent pair, then merges feed later supersteps") {
    // "aaab" x2 + "ab": pairs aa=4, ab=3 -> merge 1 = "aa".
    // After replace, "aaab" -> sent1+"ab", so superstep 2 sees ab=3 on top.
    val m = merges(corpus("aaab", "aaab", "ab"), 2)
    assert(m.filter(_._2 == 1).toSeq == Seq((1, 1, "aa", 4L), (2, 1, "ab", 3L)))
  }

  test("overlapping occurrences replace left-to-right, non-overlapping") {
    // "aaa": the pair census counts both "aa" positions, but the merge
    // consumes left-to-right -> sent1 + "a", never a double merge
    val m = merges(corpus("aaa"), 2)
    assert(m.filter(_._2 == 1).toSeq ==
      Seq((1, 1, "aa", 2L), (2, 1, Sent1 + "a", 1L)))
  }

  test("count ties break lexicographically") {
    val m = merges(corpus("abcd"), 1)
    assert(m.head == ((1, 1, "ab", 1L)))
    assert(m.map(_._3).toSeq == Seq("ab", "bc", "cd"))
  }

  test("single-char docs contribute no pairs") {
    val m = merges(corpus("a", "b", "xy"), 1)
    assert(m.toSeq == Seq((1, 1, "xy", 1L)))
  }
}

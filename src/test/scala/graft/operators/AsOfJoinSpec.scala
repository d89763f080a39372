package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def fixture = {
    val s = SparkSpec.session
    import s.implicits._
    val left = Seq(
      (1L, 10L, "c1"), (1L, 20L, "c2"), (1L, 15L, "c3"),
      (2L, 5L, "c4"), // key with no right rows at or before
      (3L, 7L, "c5")) // key absent from right entirely
      .toDF("uid", "t", "click")
    val right = Seq(
      (1L, 8L, "e1", 1.0), (1L, 15L, "e2", 2.0), (1L, 30L, "e3", 3.0),
      (2L, 9L, "e4", 4.0))
      .toDF("uid", "t", "err", "v")
    (left, right)
  }

  test("asof left: latest right at or before each left row, inclusive ties") {
    val (l, r) = fixture
    val out = AsOfJoin.asofLeft(l, r, Seq("uid"), "t", "t")
      .select("click", "right_err", "right_v").collect()
      .map(x => x.getString(0) -> (Option(x.getString(1)), Option(x.get(2)))).toMap
    assert(out("c1") == (Some("e1"), Some(1.0))) // 10 >= 8
    assert(out("c2") == (Some("e2"), Some(2.0))) // 20 >= 15, not 30
    assert(out("c3") == (Some("e2"), Some(2.0))) // tie: 15 >= 15 inclusive
    assert(out("c4") == (None, None))            // right row is later (9 > 5)
    assert(out("c5") == (None, None))            // key absent
  }

  test("asof inner drops unmatched left rows") {
    val (l, r) = fixture
    val out = AsOfJoin.asofInner(l, r, Seq("uid"), "t", "t")
      .select("click").collect().map(_.getString(0)).toSet
    assert(out == Set("c1", "c2", "c3"))
  }

  test("inner keeps matches whose payload fields are all null") {
    val s = SparkSpec.session
    import s.implicits._
    val l = Seq((1L, 100L, "c1")).toDF("uid", "t", "click")
    val r = Seq((1L, 50L, None: Option[String], None: Option[Double]))
      .toDF("uid", "t", "err", "v")
    // the matched right row exists even though err/v are null → inner keeps it
    assert(AsOfJoin.asofInner(l, r, Seq("uid"), "t", "t").count() == 1)
  }

  test("right side with no payload columns still works") {
    val s = SparkSpec.session
    import s.implicits._
    val l = Seq((1L, 100L, "c1"), (2L, 100L, "c2")).toDF("uid", "t", "click")
    val r = Seq((1L, 50L)).toDF("uid", "t")
    assert(AsOfJoin.asofLeft(l, r, Seq("uid"), "t", "t").count() == 2)
    val inner = AsOfJoin.asofInner(l, r, Seq("uid"), "t", "t")
    assert(inner.select("click").collect().map(_.getString(0)).toSeq == Seq("c1"))
  }

  test("ties among right rows at the same (key, time) resolve deterministically") {
    val s = SparkSpec.session
    import s.implicits._
    val l = Seq((1L, 100L, "c1")).toDF("uid", "t", "click")
    // two right rows at the same key+timestamp: the max payload struct wins
    // (ordering is (__rt, err, v) → "e9" > "e2"), on every run/partitioning
    val r = Seq((1L, 50L, "e2", 2.0), (1L, 50L, "e9", 9.0))
      .toDF("uid", "t", "err", "v")
    (1 to 3).foreach { _ =>
      val row = AsOfJoin.asofLeft(l, r.repartition(7), Seq("uid"), "t", "t")
        .select("right_err", "right_v").head()
      assert(row.getString(0) == "e9" && row.getDouble(1) == 9.0)
    }
  }

  test("payload fills atomically (no cross-row column mixing)") {
    val s = SparkSpec.session
    import s.implicits._
    // e5 has a null v; a per-column fill would pair e5 with e4's v
    val l = Seq((1L, 100L, "c1")).toDF("uid", "t", "click")
    val r = Seq((1L, 50L, "e4", Some(4.0)), (1L, 60L, "e5", None: Option[Double]))
      .toDF("uid", "t", "err", "v")
    val row = AsOfJoin.asofLeft(l, r, Seq("uid"), "t", "t")
      .select("right_err", "right_v").head()
    assert(row.getString(0) == "e5" && row.isNullAt(1))
  }
}

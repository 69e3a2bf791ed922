package graft.operators

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def l(rows: (Long, String)*) = rows.toDF("id_l", "name_l")
  private def r(rows: (Long, String)*) = rows.toDF("id_r", "name_r")

  test("linkEd1 finds every edit-distance-<=1 pair: exact, sub, ins, del") {
    val left = l((1L, "widget"), (2L, "wadget"), (3L, "widgets"),
      (4L, "idget"), (5L, "gadget"))
    val right = r((10L, "widget"))
    val pairs = RecordLinkage.linkEd1(left, right).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(4))).sortBy(_._1)
    // gadget is distance 2 (two substitutions) -> excluded
    assert(pairs.toSeq === Seq((1L, 10L, 0L), (2L, 10L, 1L),
      (3L, 10L, 1L), (4L, 10L, 1L)))
  }

  test("linkEd1 blocking has full recall over random 1-edit perturbations") {
    val base = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "shiny plate", "matte cover")
    // deterministic perturbations: delete char i%len, substitute 'z'
    // at (i*3)%len, insert 'q' at (i*5)%len
    val dirty = base.zipWithIndex.flatMap { case (s, i) =>
      val d = s.patch(i % s.length, "", 1)
      val sub = s.updated((i * 3) % s.length, 'z')
      val ins = s.patch((i * 5) % s.length, "q", 0)
      Seq((i * 10L, d), (i * 10L + 1, sub), (i * 10L + 2, ins))
    }
    val right = r(base.zipWithIndex.map { case (s, i) => (i.toLong, s) }: _*)
    val got = RecordLinkage.linkEd1(l(dirty: _*), right).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSet
    // every dirty record must link back to its source (id_l / 10)
    for ((id, _) <- dirty)
      assert(got.contains((id, id / 10)), s"missing link for dirty id $id")
  }

  test("linkEd1 output is distinct even when multiple blocking keys collide") {
    // "ab" vs "ab": shares keys "ab", "a", "b" -> 3 raw hits, 1 row out
    val got = RecordLinkage.linkEd1(l((1L, "ab")), r((2L, "ab"))).collect()
    assert(got.length === 1)
  }
}

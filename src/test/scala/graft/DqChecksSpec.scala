package graft

import graft.operators.Warehouse

/** Pins [[Warehouse.dqChecks]] against independent recomputes of each
  * invariant, and requires both verdict branches live on the fixture
  * (the completeness check fires; the integrity checks pass).
  */
class DqChecksSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val got = Warehouse.dqChecks(spark, dir).collect()
    .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
    .toMap

  test("six checks, each matching an independent recompute") {
    val ev = graft.sources.Tables.events(spark, dir)
    val ord = graft.sources.Tables.orders(spark, dir)
    val li = graft.sources.Tables.lineitem(spark, dir)
    val cust = graft.sources.Tables.customer(spark, dir)
    val docs = graft.sources.Tables.documents(spark, dir)

    val nEv = ev.count()
    val nOrd = ord.count()
    val custKeys = cust.select("c_custkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    val liKeys = li.select("l_orderkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    val ordKeys = ord.select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))

    val expected = Map(
      "events_user_id_not_null" ->
        ((nEv, ev.filter("user_id IS NULL").count())),
      "events_event_id_unique" ->
        ((nEv, ev.filter("event_id IS NOT NULL").count()
          - ev.select("event_id").na.drop().distinct().count())),
      "orders_custkey_fk" ->
        ((nOrd, ordKeys.count(o => !custKeys.contains(o._2)).toLong)),
      "orders_have_lineitems" ->
        ((nOrd, ordKeys.count(o => !liKeys.contains(o._1)).toLong)),
      "lineitem_qty_range" ->
        ((li.count(), li.filter("l_quantity < 1 OR l_quantity > 50").count())),
      "documents_nchars_consistent" ->
        ((docs.count(), docs.filter("n_chars <> length(text)").count())))

    assert(got.keySet == expected.keySet)
    got.foreach { case (name, (n, v, pass)) =>
      val (en, ev2) = expected(name)
      assert(n == en && v == ev2, s"check $name")
      assert(pass == (v == 0L))
    }
  }

  test("both verdict branches are live on the fixture") {
    assert(!got("orders_have_lineitems")._3,
      "the completeness check must fire")
    assert(got("orders_custkey_fk")._3 && got("events_event_id_unique")._3,
      "the integrity checks must pass")
  }
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ReplicationState._

class ReplicationStateStoreSpec extends AnyFunSuite {

  private def derby(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("phase lifecycle persists and a restarted store reloads it") {
    val url = derby("repstate1")
    val store = new ReplicationStateStore(url)
    assert(store.all.isEmpty)

    store.update("public.orders", Init, Some("wh.orders"))
    store.update("public.orders", DataSync)
    store.update("public.orders", FinishedCopy)
    store.update("public.orders", Ready)
    store.update("public.lineitem", DataSync, Some("wh.lineitem"))
    store.update("public.broken", Errored("decode failure"))

    assert(store.get("public.orders").contains(Ready))
    assert(store.ready == Set("public.orders"))
    // mapping sticks across phase-only updates
    assert(store.mapping("public.orders").contains("wh.orders"))

    // a new instance over the same database = crash restart: memory
    // warms from the last durable snapshot
    val reborn = new ReplicationStateStore(url)
    assert(reborn.all == Map(
      "public.orders" -> Ready,
      "public.lineitem" -> DataSync,
      "public.broken" -> Errored("decode failure")))
    assert(reborn.mapping("public.lineitem").contains("wh.lineitem"))
  }

  test("cleanup removes a table from memory and the durable store") {
    val url = derby("repstate2")
    val store = new ReplicationStateStore(url)
    store.update("t1", Ready)
    store.update("t2", Skipped)
    store.cleanup("t1")
    assert(store.get("t1").isEmpty && store.get("t2").contains(Skipped))
    assert(new ReplicationStateStore(url).all == Map("t2" -> Skipped))
  }

  test("updateAll is one transaction: a mid-write crash rolls back both keys") {
    val url = derby("repstate4")
    val store = new ReplicationStateStore(url)
    store.update("t1", Init, Some("wh.t1"))
    store.update("t2", Init, Some("wh.t2"))

    // the happy path: both rows land atomically and reload together
    assert(store.updateAll(Seq(
      ("t1", DataSync, None), ("t2", DataSync, None))))
    assert(new ReplicationStateStore(url).all ==
      Map("t1" -> DataSync, "t2" -> DataSync))

    // crash INJECTED between the first and second row write, inside
    // the transaction: the backend must roll back to the pre-txn
    // snapshot — never a torn t1=Ready/t2=DataSync state
    val crashing = new ReplicationStateStore(url, persistAttempts = 1) {
      private var rows = 0
      override protected def afterRowPersist(tbl: String): Unit = {
        rows += 1
        if (rows == 2) sys.error("simulated crash mid-transaction")
      }
    }
    val ok = crashing.updateAll(Seq(
      ("t1", Ready, None), ("t2", Ready, None)))
    assert(!ok, "exhausted persist must report failure")
    // memory stays ahead (the store's documented contract) …
    assert(crashing.get("t1").contains(Ready))
    // … but the durable snapshot is the consistent pre-txn state
    val reloaded = new ReplicationStateStore(url)
    assert(reloaded.all == Map("t1" -> DataSync, "t2" -> DataSync),
      s"torn durable state: ${reloaded.all}")
    // mappings survived untouched too
    assert(reloaded.mapping("t1").contains("wh.t1"))
    assert(reloaded.mapping("t2").contains("wh.t2"))
  }

  test("memory stays ahead when persistence is unavailable") {
    // a store pointed at a database that stops existing: updates keep
    // serving from memory and report the persist failure
    val store = new ReplicationStateStore(derby("repstate3"))
    assert(store.update("t", Init))
    val broken = new ReplicationStateStore(derby("repstate3")) {
      // simulate backend loss: unreachable url for persists only
    }
    // drop the in-memory database out from under the store
    try {
      java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:repstate3;drop=true")
    } catch { case _: java.sql.SQLException => () } // drop "fails" with 08006
    val ok = broken.update("t", Ready)
    assert(!ok, "persist must report failure once retries exhaust")
    assert(broken.get("t").contains(Ready), "memory must stay ahead")
  }
}

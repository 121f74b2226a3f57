package graft

import org.scalatest.funsuite.AnyFunSuite

class DriverMemoSpec extends AnyFunSuite {

  test("trains once per key and serves the memoized value after") {
    val memo = new DriverMemo[String, Int]()
    var trainings = 0
    def get(k: String): Int = memo.getOrElseUpdate(k) { trainings += 1; k.length }
    assert(get("alpha") == 5)
    assert(get("alpha") == 5)
    assert(get("beta") == 4)
    assert(trainings == 2)
  }

  test("evicts least-recently-USED beyond the cap (access refreshes recency)") {
    val memo = new DriverMemo[Int, Int](cap = 3)
    (1 to 3).foreach(k => memo.getOrElseUpdate(k)(k * 10))
    // touch 1 so it is most-recent; inserting 4 must evict 2, not 1
    assert(memo.getOrElseUpdate(1)(fail("1 must be cached")) == 10)
    memo.getOrElseUpdate(4)(40)
    assert(memo.size == 3)
    assert(memo.keys.toSet == Set(1, 3, 4))
    var retrained = false
    assert(memo.getOrElseUpdate(2) { retrained = true; -2 } == -2)
    assert(retrained, "evicted key 2 must retrain")
  }

  test("orphaned-session growth is bounded at the cap (the round-10 advice shape)") {
    val memo = new DriverMemo[(Int, String), Array[Double]](cap = 8)
    // 100 "sessions" over the same path — the identityHashCode-keyed
    // pattern that used to accumulate one orphan model per dead session
    (1 to 100).foreach(sess =>
      memo.getOrElseUpdate((sess, "/corpus"))(Array.fill(4)(sess.toDouble)))
    assert(memo.size == 8)
  }

  test("a throwing train thunk caches nothing and leaves the memo usable") {
    val memo = new DriverMemo[String, Int]()
    intercept[RuntimeException] {
      memo.getOrElseUpdate("k")(throw new RuntimeException("boom"))
    }
    assert(memo.size == 0)
    assert(memo.getOrElseUpdate("k")(7) == 7)
  }

  test("clear drops everything (the invalidate*Cache contract)") {
    val memo = new DriverMemo[String, Int]()
    memo.getOrElseUpdate("a")(1)
    memo.getOrElseUpdate("b")(2)
    memo.clear()
    assert(memo.size == 0)
    var retrained = 0
    memo.getOrElseUpdate("a") { retrained += 1; 1 }
    assert(retrained == 1)
  }

  test("concurrent same-key callers observe exactly one training") {
    val memo = new DriverMemo[String, Int]()
    val trainings = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 32).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = memo.getOrElseUpdate("model") {
            Thread.sleep(5)
            trainings.incrementAndGet()
            42
          }
        })
      }
      assert(futures.map(_.get()).forall(_ == 42))
      assert(trainings.get() == 1)
    } finally pool.shutdown()
  }
}

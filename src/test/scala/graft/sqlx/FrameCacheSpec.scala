package graft.sqlx

import graft.SparkSpec

/** Cache-lifecycle contract: memoization builds once, clear() unpersists
  * and forgets so the next access rebuilds (a long-lived session can bound
  * its pinned storage). */
class FrameCacheSpec extends SparkSpec {
  import spark.implicits._

  test("getOrElseUpdate memoizes; clear() forgets and the next access rebuilds") {
    var builds = 0
    def get() = FrameCache.getOrElseUpdate(FrameCache.key(spark, "fcspec")) {
      builds += 1
      Seq(1, 2, 3).toDF("x").persist()
    }
    get(); get()
    assert(builds == 1, "second access must hit the cache")
    assert(FrameCache.size > 0)
    FrameCache.clear()
    assert(FrameCache.size == 0)
    get()
    assert(builds == 2, "post-clear access must rebuild")
    FrameCache.clear()
  }
}

package graft.sqlx

import graft.SparkSpec

/** Lifecycle of the PathTag-keyed session stores (round-17): a session
  * accumulates staged `/tmp/graft-*` stores per corpus dir — versioned
  * watermark state, ANN index dirs — with no vacuum tied to
  * [[FrameCache.clear]]; [[FrameCache.clearSessionStores]] closes that
  * gap. The contract under test: (1) the vacuum deletes exactly the
  * tag-carrying stores, (2) a cleared session REBUILDS — the same
  * registered query re-run after the vacuum reproduces its result
  * byte-for-byte from the corpus alone. The spec runs against a private
  * COPY of sf0.001 so its tag is disjoint from the shared-corpus stores
  * other suites build (the vacuum itself is tag-global; rebuild-if-absent
  * makes that safe, but there is no need to churn neighbours). */
class SessionStoresSpec extends SparkSpec {

  private def copyCorpus(): String = {
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    val dst = java.nio.file.Files.createTempDirectory("graftspec-corpus")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(src)
    try files.iterator().asScala.foreach { p =>
      java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString))
    } finally files.close()
    dst.toString
  }

  private def tagDirs(tag: String): Seq[String] = {
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    import scala.jdk.CollectionConverters._
    val entries = java.nio.file.Files.list(tmp)
    try entries.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("graft-") && n.contains(tag)).toList.sorted
    finally entries.close()
  }

  private def rows(name: String, dir: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).toSeq.sorted
  }

  test("clearSessionStores vacuums this session's staged stores and the session rebuilds identically") {
    val dir = copyCorpus()
    val tag = PathTag.of(dir)
    // two store-building families: a versioned CAS store (watermarks) and
    // an ANN index store (IVF)
    val wm1 = rows("watermark_roundtrip", dir)
    val ivf1 = rows("ann_ivf", dir)
    val before = tagDirs(tag)
    assert(before.nonEmpty, "queries built no tag-keyed session stores — spec premise broken")

    val deleted = FrameCache.clearSessionStores()
    assert(before.forall(d => deleted.exists(_.endsWith(d))),
      s"vacuum missed stores: ${before.filterNot(d => deleted.exists(_.endsWith(d)))}")
    assert(tagDirs(tag).isEmpty, "tag-keyed stores survived the vacuum")

    // cleared session rebuilds from the corpus alone, byte-identically
    assert(rows("watermark_roundtrip", dir) == wm1, "watermark store did not rebuild equivalently")
    assert(rows("ann_ivf", dir) == ivf1, "ANN index store did not rebuild equivalently")
    assert(tagDirs(tag).nonEmpty, "rebuild created no stores — did the query silently skip staging?")

    // cleanup: vacuum again and drop the corpus copy
    FrameCache.clearSessionStores()
    val corpus = java.nio.file.Paths.get(dir)
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(corpus)
    try files.iterator().asScala.foreach(java.nio.file.Files.delete(_))
    finally files.close()
    java.nio.file.Files.delete(corpus)
  }
}

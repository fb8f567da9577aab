package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** The versioned-commit protocol was pointed at a filesystem whose
  * primitives cannot carry its CAS (rename is client-side copy+delete,
  * create is an unconditional PUT). Thrown BEFORE any store I/O — a
  * protocol that silently degrades to last-writer-wins on S3 is worse
  * than one that refuses loudly and names the seam to plug. */
final class UnsupportedCommitFilesystemException(msg: String)
  extends RuntimeException(msg)

/** The two atomic primitives every CAS in [[CommittedVersions]] reduces
  * to, behind a per-scheme seam — the same shape as Delta Lake's
  * pluggable `LogStore`, and for the same reason: the protocol's
  * guarantees are exactly the guarantees of these two operations on the
  * target filesystem, so the filesystem binding must be explicit and
  * swappable rather than an implementation detail.
  *
  * Guarantee matrix (the full write-up lives in `docs/COMMITS.md`):
  *
  *  - HDFS / viewfs / webhdfs — rename and create(overwrite=false) are
  *    atomic at the namenode: full CAS, the default arbiter applies.
  *  - Local file:// — Hadoop's local create(overwrite=false) is a
  *    non-atomic exists()-then-create, so the default arbiter routes
  *    through java.nio (O_CREAT|O_EXCL, rename(2)): full CAS.
  *  - ABFS (abfss://, hierarchical namespace) / Ozone (ofs://) — real
  *    directory trees with atomic rename: full CAS through the default
  *    arbiter. ABFS WITHOUT hierarchical namespace is blob storage and
  *    belongs in the next class; the scheme cannot reveal which, so the
  *    matrix documents the precondition.
  *  - S3-class flat object stores (s3a://, gs://, oss://, wasb://, …) —
  *    `rename` is a client-side copy-then-delete: non-atomic, not
  *    fail-on-existing, O(bytes); `create` is an unconditional PUT.
  *    Neither primitive exists, so the default resolution REFUSES with
  *    [[UnsupportedCommitFilesystemException]]. The supported path is a
  *    registered arbiter backed by a real conditional primitive — e.g.
  *    S3 `If-None-Match:*` conditional PUT on a commit-marker object
  *    (put-if-absent of `v=N/_SUCCESS` replaces the dir rename as the
  *    arbiter; data files are immutable uniquely-named writes, which
  *    object stores handle fine) or a DynamoDB-style external
  *    coordinator — the two designs S3-committer literature converged
  *    on. None ships here because none is locally testable; the seam,
  *    the refusal, and the dispatch are, and [[ConcurrencySpec]] pins
  *    all three.
  *
  * The READ half of the protocol ([[CommittedVersions.list]]: directory
  * listing + `_SUCCESS`-marker check) needs no atomic primitive and
  * works on any strongly-consistent store (S3 included, since 2020);
  * only the write half dispatches through this seam. */
trait CommitArbiter {
  /** Atomic exclusive create — true iff THIS caller created the file. */
  def tryCreateExclusive(spark: SparkSession, file: String): Boolean

  /** Atomic no-overwrite rename of a complete directory — false iff dst
    * already exists (or the rename raced and lost). Must never merge src
    * INTO an existing dst. */
  def tryAtomicRename(spark: SparkSession, src: Path, dst: Path): Boolean
}

object CommitArbiter {

  /** Schemes whose Hadoop filesystem provides both primitives natively
    * (hierarchical namespace, atomic metadata ops). */
  val AtomicRenameSchemes: Set[String] =
    Set("file", "hdfs", "viewfs", "webhdfs", "swebhdfs", "abfs", "abfss", "ofs", "o3fs")

  /** Flat object stores whose rename is client-side copy+delete and
    * whose create is an unconditional PUT — refused unless an arbiter
    * with real conditional primitives is registered. */
  val CopyRenameSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "obs", "wasb", "wasbs", "swift")

  private val registry = TrieMap.empty[String, CommitArbiter]

  /** Bind `arbiter` for `scheme` (e.g. an S3 conditional-PUT arbiter for
    * "s3a"). A registration overrides the default resolution, including
    * for [[AtomicRenameSchemes]]. */
  def register(scheme: String, arbiter: CommitArbiter): Unit =
    registry.put(scheme.toLowerCase, arbiter)

  def deregister(scheme: String): Unit = registry.remove(scheme.toLowerCase)

  private def schemeOf(path: String): String =
    Option(new Path(path).toUri.getScheme).getOrElse("file").toLowerCase

  /** Resolve the arbiter for a store path — registered binding first,
    * then the default Hadoop arbiter for schemes with native atomic
    * primitives; anything else fails loudly BEFORE any store I/O. */
  def forPath(path: String): CommitArbiter = {
    val scheme = schemeOf(path)
    registry.get(scheme).getOrElse {
      if (AtomicRenameSchemes.contains(scheme)) HadoopCommitArbiter
      else if (CopyRenameSchemes.contains(scheme))
        throw new UnsupportedCommitFilesystemException(
          s"versioned commits to '$scheme://' are refused: this object store's " +
            "rename is a non-atomic copy+delete and its create is an unconditional " +
            "PUT, so the commit CAS would silently degrade to last-writer-wins. " +
            "Register a CommitArbiter built on the store's conditional primitives " +
            "(e.g. conditional PUT / If-None-Match) via CommitArbiter.register " +
            s"(\"$scheme\", ...) - see docs/COMMITS.md for the guarantee matrix")
      else
        throw new UnsupportedCommitFilesystemException(
          s"versioned commits to unknown filesystem scheme '$scheme://' are " +
            "refused: the commit CAS requires atomic no-overwrite rename and " +
            "exclusive create, and this scheme's guarantees are unverified. " +
            "Register a CommitArbiter via CommitArbiter.register(\"" + scheme +
            "\", ...) after verifying them - see docs/COMMITS.md")
    }
  }
}

/** Default arbiter for filesystems with native atomic metadata ops —
  * the implementations that previously lived inline in
  * [[CommittedVersions]] (behavior unchanged, see each method). */
object HadoopCommitArbiter extends CommitArbiter {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** On HDFS, create(overwrite=false) is atomic at the namenode; Hadoop's
    * LOCAL filesystems however implement it as a non-atomic
    * exists()-then-create (measured: 8 racing threads all "won"), so
    * local paths route through java.nio's createFile — a real
    * O_CREAT|O_EXCL. A generic IOException re-checks existence so an
    * actual IO failure surfaces instead of silently reading as "lost the
    * race". */
  def tryCreateExclusive(spark: SparkSession, file: String): Boolean = {
    val p = new Path(file)
    val fs = fsOf(spark, file)
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
        try { java.nio.file.Files.createFile(local); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case _ =>
        Option(p.getParent).foreach(fs.mkdirs(_))
        try { fs.create(p, false).close(); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
          case e: java.io.IOException => if (fs.exists(p)) false else throw e
        }
    }
  }

  /** FileSystem.rename is NOT the required primitive: its contract moves
    * src INTO an existing dst directory, mv-style (measured: a blind
    * rename onto a committed version "succeeded" by nesting the staged
    * dir inside it). Local paths use java.nio Files.move without
    * REPLACE_EXISTING (rename(2): ENOTEMPTY on a non-empty dst —
    * committed version dirs are never empty); remote filesystems go
    * through FileContext.rename with the default Options.Rename.NONE,
    * atomic at the namenode. */
  def tryAtomicRename(spark: SparkSession, src: Path, dst: Path): Boolean =
    fsOf(spark, dst.toString) match {
      case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(src.toUri.getPath),
            java.nio.file.Paths.get(dst.toUri.getPath))
          true
        } catch { case _: java.io.IOException => false }
      case _ =>
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, spark.sparkContext.hadoopConfiguration)
        try { fc.rename(src, dst); true }
        catch { case _: java.io.IOException => false }
    }
}

package graft.engine.source

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** A local FileSystem with HDFS's rename contract: `rename` REFUSES an
  * existing destination (returns false) instead of posix-replacing it.
  * The scheme is whatever the initialize URI carries, so one class
  * serves both test schemes below. */
class RenameRefusingFileSystem extends RawLocalFileSystem {
  private var scheme: String = "refuse"
  override def initialize(name: URI, conf: Configuration): Unit = {
    scheme = name.getScheme
    super.initialize(name, conf)
  }
  override def getUri: URI = URI.create(s"$scheme:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}

/** The AbstractFileSystem binding that gives the `refuse` scheme a
  * FileContext (reflection contract: a (URI, Configuration) ctor).
  * Its inherited 3-arg renameInternal implements OVERWRITE — the same
  * entry point HDFS serves with its atomic-replace RPC. */
class RefuseAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new RenameRefusingFileSystem, conf, "refuse", false)

/** The manifest publish's non-posix branches, unreachable on the
  * plain local FS (posix rename(2) replaces an existing destination,
  * so the first `f.rename` always wins in every other suite):
  *
  *  1. HDFS-style refusal WITH a FileContext binding → the swap goes
  *     through `FileContext.rename(OVERWRITE)`;
  *  2. refusal on a scheme with NO AbstractFileSystem binding → the
  *     documented last-resort delete-then-rename.
  *
  * Both must leave exactly the new manifest and no `.tmp` behind. */
class ManifestPublishSpec extends AnyFunSuite {

  private def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.refuse.impl", classOf[RenameRefusingFileSystem].getName)
    c.set("fs.refuse.impl.disable.cache", "true")
    c.set("fs.AbstractFileSystem.refuse.impl", classOf[RefuseAbstractFs].getName)
    c.set("fs.refuse2.impl", classOf[RenameRefusingFileSystem].getName)
    c.set("fs.refuse2.impl.disable.cache", "true")
    c
  }

  private def publishTwice(scheme: String): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = new Path(s"$scheme://" + graft.engine.TempDirs.scratch(s"manifest-$scheme"))
    val f = dir.getFileSystem(conf())
    GraftBinarySource.writeManifest(f, dir, Seq("a.gbin"), "t1")
    assert(GraftBinarySource.readManifest(f, dir).contains(Seq("a.gbin")),
      "first publish (no existing manifest) must land via the plain rename")
    GraftBinarySource.writeManifest(f, dir, Seq("b.gbin"), "t2")
    (f, dir)
  }

  test("rename-refusing FS with a FileContext binding: the swap replaces the manifest") {
    // prove this scheme really takes the FileContext branch: the
    // binding resolves, so the catch below can't have been the path
    org.apache.hadoop.fs.FileContext.getFileContext(URI.create("refuse:///"), conf())
    val (f, dir) = publishTwice("refuse")
    assert(GraftBinarySource.readManifest(f, dir).contains(Seq("b.gbin")))
    val leftovers = f.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"publish left temp files: ${leftovers.mkString(",")}")
  }

  test("rename-refusing FS with NO FileContext binding: the last-resort path still replaces") {
    // prove this scheme has no FileContext, so the publish can only
    // have gone through the documented delete-then-rename last resort
    intercept[org.apache.hadoop.fs.UnsupportedFileSystemException] {
      org.apache.hadoop.fs.FileContext.getFileContext(URI.create("refuse2:///"), conf())
    }
    val (f, dir) = publishTwice("refuse2")
    assert(GraftBinarySource.readManifest(f, dir).contains(Seq("b.gbin")))
    val leftovers = f.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"publish left temp files: ${leftovers.mkString(",")}")
  }
}

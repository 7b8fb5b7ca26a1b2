package graft.sources

import java.io.FileNotFoundException
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A from-scratch Hadoop FileSystem registered under the literal `s3a`
  * scheme (via `fs.s3a.impl`) and backed by a local directory per bucket.
  * Unlike the `graftfs` RawLocalFileSystem alias, every Path this FS
  * returns carries scheme AND authority (`s3a://bucket/key`) — the shape
  * real object-store paths have — so it catches bugs the local alias
  * cannot: authority dropped when deriving sibling index paths (`.fai`,
  * `.tbi`, `.crai`), scheme-less string concatenation, java.io bypasses,
  * and write-path rename assumptions. It is NOT the AWS connector: auth,
  * retries and multipart semantics still need hadoop-aws + an endpoint
  * (see the jar-gated live test in S3ContractSpec).
  */
class FakeS3AFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var bucketRoot: java.nio.file.Path = _
  private var cwd: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    require(name.getAuthority != null, s"fake s3a needs a bucket: $name")
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    bucketRoot = java.nio.file.Paths.get(
      conf.get("graft.test.fakes3.root", "/tmp/graft-fakes3"), name.getAuthority)
    cwd = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "s3a"
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = cwd = dir

  private def local(p: Path): java.nio.file.Path = {
    val key = p.toUri.getPath.stripPrefix("/")
    if (key.isEmpty) bucketRoot else bucketRoot.resolve(key)
  }

  private def toS3(lp: java.nio.file.Path): Path =
    if (lp == bucketRoot) new Path(fsUri.toString + "/")
    else new Path(fsUri.toString + "/" + bucketRoot.relativize(lp).toString)

  private def status(lp: java.nio.file.Path): FileStatus = {
    if (!java.nio.file.Files.exists(lp)) throw new FileNotFoundException(lp.toString)
    val dir = java.nio.file.Files.isDirectory(lp)
    new FileStatus(if (dir) 0 else java.nio.file.Files.size(lp), dir, 1,
      32 * 1024 * 1024,
      java.nio.file.Files.getLastModifiedTime(lp).toMillis, toS3(lp))
  }

  override def getFileStatus(f: Path): FileStatus = status(local(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val lp = local(f)
    if (!java.nio.file.Files.exists(lp)) throw new FileNotFoundException(f.toString)
    if (!java.nio.file.Files.isDirectory(lp)) Array(status(lp))
    else {
      val s = java.nio.file.Files.list(lp)
      try s.iterator().asScala.map(status).toArray.sortBy(_.getPath.toString)
      finally s.close()
    }
  }

  private implicit class IterScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val lp = local(f)
    if (!java.nio.file.Files.isRegularFile(lp)) throw new FileNotFoundException(f.toString)
    new FSDataInputStream(new FakeS3AInputStream(lp))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val lp = local(f)
    if (!overwrite && java.nio.file.Files.exists(lp))
      throw new java.io.IOException(s"already exists: $f")
    java.nio.file.Files.createDirectories(lp.getParent)
    new FSDataOutputStream(java.nio.file.Files.newOutputStream(lp), null)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append")

  override def rename(src: Path, dst: Path): Boolean = {
    val ls = local(src); val ld = local(dst)
    if (!java.nio.file.Files.exists(ls)) return false
    java.nio.file.Files.createDirectories(ld.getParent)
    java.nio.file.Files.move(ls, ld,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val lp = local(f)
    if (!java.nio.file.Files.exists(lp)) return false
    if (java.nio.file.Files.isDirectory(lp)) {
      val children = java.nio.file.Files.list(lp)
      val hasChildren = try children.findFirst().isPresent finally children.close()
      if (hasChildren && !recursive) throw new java.io.IOException(s"not empty: $f")
      val walk = java.nio.file.Files.walk(lp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    } else java.nio.file.Files.delete(lp)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    java.nio.file.Files.createDirectories(local(f))
    true
  }
}

/** Seekable stream over the backing object via FileChannel. */
class FakeS3AInputStream(lp: java.nio.file.Path) extends FSInputStream {
  private val ch = java.nio.channels.FileChannel.open(lp,
    java.nio.file.StandardOpenOption.READ)

  override def seek(pos: Long): Unit = ch.position(pos)
  override def getPos: Long = ch.position()
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val b = java.nio.ByteBuffer.allocate(1)
    if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int =
    ch.read(java.nio.ByteBuffer.wrap(buf, off, len))

  override def close(): Unit = ch.close()
}

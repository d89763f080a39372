package graft.sources

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with the per-file process fork removed (optimization
  * guide §7.3 "commit-protocol frames at the end of a write").
  *
  * Without libhadoop (`NativeCodeLoader` WARN — the usual state of a bare
  * JVM sandbox and of many container images), Hadoop 3.4's
  * `RawLocalFileSystem` falls back from `NativeIO.POSIX.chmod` to
  * `Shell.execCommand("chmod", ...)` — a process fork+exec — inside
  * `setPermission`, which `LocalFSFileOutputStream`'s constructor calls for
  * EVERY file created through the Hadoop FS API. Every parquet part file,
  * every `.crc` twin, every transaction-log entry, bloom sidecar, DV file,
  * and streaming-checkpoint file pays one fork (~3 ms process cost plus
  * Hadoop's Shell thread/stream plumbing — measured 3.0 ms/fork bare on
  * this host). A streaming-ingest lifecycle creates 100+ files, so the
  * driver burns ~0.5-1 s per query in fork/exec that jstack sampling
  * caught red-handed (`ProcessImpl.forkAndExec` on the stream execution
  * thread).
  *
  * The override implements the same chmod with `java.nio.file.Files`
  * (sub-microsecond syscall, no fork). Behavior is identical: same bits
  * set, same exceptions on missing files. Registered for `file://` via
  * `spark.hadoop.fs.file.impl` (FileSystem API) and
  * `spark.hadoop.fs.AbstractFileSystem.file.impl` (FileContext API — the
  * streaming checkpoint manager's path) in [[graft.GraftSession]].
  *
  * On a real cluster (HDFS/S3/ABFS) this class is inert — those schemes
  * have their own FileSystem implementations — and a host with libhadoop
  * never reaches the Shell fallback in the first place; the fix targets
  * exactly the local deployment the bench contract runs. */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    NioLocalFileSystem.chmodNio(pathToFile(p).toPath, permission)

  /** Second fork source, caught by the same stack sampling on the stream
    * execution thread: without libhadoop, `getFileLinkStatus` takes
    * `deprecatedGetFileLinkStatusInternal`, which UNCONDITIONALLY forks a
    * `readlink` process (`FileUtil.readLink` → `Shell.execCommand`) just
    * to learn whether the path is a symlink — and
    * `AbstractFileSystem.renameInternal` calls it for BOTH src and dst,
    * so every FileContext rename (every streaming-checkpoint offset /
    * commit / metadata write goes through
    * `RenameBasedFSDataOutputStream.close`) paid two forks. java.nio
    * answers the symlink question with one lstat; the rare true-symlink
    * case falls back to the stock path so link-target semantics stay
    * byte-identical. */
  override def getFileLinkStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    val nio = pathToFile(f).toPath
    if (java.nio.file.Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else getFileStatus(f) // non-link: link status == file status
  }

  /** Third fork source: the no-native `getFileStatus` returns a
    * `DeprecatedRawLocalFileStatus` whose permission/owner/group fields
    * load LAZILY by forking `ls -ld` and parsing its output
    * (`loadPermissionInfo`). Any consumer that touches `getPermission()`
    * (commit protocols, checkpoint managers, FileContext's create-time
    * umask checks) pays a fork per file. One `readAttributes` syscall
    * carries all of it. Non-POSIX stores fall back to the stock path. */
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    val file = pathToFile(f)
    try {
      // numeric "unix:" bulk read: resolving owner/group NAMES eagerly
      // costs a getpwuid/getgrgid NSS lookup per call (stack-sampled on
      // the commit path) — the ids are in the stat the read already did,
      // and the names resolve once per distinct id via the cache below
      val m = java.nio.file.Files.readAttributes(file.toPath,
        "unix:mode,size,isDirectory,lastModifiedTime,lastAccessTime,uid,gid")
      val mode = m.get("mode").asInstanceOf[Integer].intValue()
      val qualified = new Path(file.getPath)
        .makeQualified(getUri, getWorkingDirectory)
      new org.apache.hadoop.fs.FileStatus(
        m.get("size").asInstanceOf[java.lang.Long].longValue(),
        m.get("isDirectory").asInstanceOf[java.lang.Boolean].booleanValue(),
        1, getDefaultBlockSize(f),
        m.get("lastModifiedTime")
          .asInstanceOf[java.nio.file.attribute.FileTime].toMillis,
        m.get("lastAccessTime")
          .asInstanceOf[java.nio.file.attribute.FileTime].toMillis,
        new FsPermission((mode & 0x1ff).toShort),
        NioLocalFileSystem.ownerName(
          m.get("uid").asInstanceOf[Integer].intValue(), file.toPath),
        NioLocalFileSystem.groupName(
          m.get("gid").asInstanceOf[Integer].intValue(), file.toPath),
        null, qualified)
    } catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(
          s"File $f does not exist")
      case _: UnsupportedOperationException | _: IllegalArgumentException =>
        super.getFileStatus(f) // non-unix view: stock path
    }
  }
}

object NioLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission._
  private val bitPerms = Seq(
    OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
    GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
    OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)

  /** uid/gid → name, resolved once per distinct id per JVM (getpwuid /
    * getgrgid walk NSS; the commit path calls getFileStatus hundreds of
    * times per lifecycle and virtually every file belongs to the process
    * user). */
  private val ownerCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()
  private val groupCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  private[sources] def ownerName(uid: Int, p: java.nio.file.Path): String =
    ownerCache.computeIfAbsent(uid, _ =>
      try java.nio.file.Files.getOwner(p).getName
      catch { case _: Exception => uid.toString })

  private[sources] def groupName(gid: Int, p: java.nio.file.Path): String =
    groupCache.computeIfAbsent(gid, _ =>
      try java.nio.file.Files
        .readAttributes(p,
          classOf[java.nio.file.attribute.PosixFileAttributes])
        .group().getName
      catch { case _: Exception => gid.toString })

  /** POSIX permission set → Hadoop FsPermission (inverse of the chmod
    * mapping below; both walk the same nine bits). */
  private[sources] def toFsPermission(
      set: java.util.Set[java.nio.file.attribute.PosixFilePermission])
      : FsPermission = {
    var mode = 0
    var i = 0
    while (i < 9) {
      if (set.contains(bitPerms(i))) mode |= (1 << i)
      i += 1
    }
    new FsPermission(mode.toShort)
  }

  private[sources] def chmodNio(p: java.nio.file.Path,
                                permission: FsPermission): Unit = {
    val mode = permission.toShort.toInt
    val set = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]
    var i = 0
    while (i < 9) {
      if ((mode & (1 << i)) != 0) set.add(bitPerms(i))
      i += 1
    }
    try java.nio.file.Files.setPosixFilePermissions(p, set)
    catch {
      case _: UnsupportedOperationException => () // non-POSIX FS: best-effort,
      // matching RawLocalFileSystem's own silent-degrade on Windows
      case e: java.io.IOException => throw e
    }
    ()
  }
}

/** The `fs.file.impl` registration target: [[LocalFileSystem]] (checksummed,
  * exactly what Hadoop installs for `file://` by default) over the
  * fork-free raw layer. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `fs.AbstractFileSystem.file.impl` twin for the FileContext API
  * (Structured Streaming's checkpoint file manager resolves `file://`
  * through AbstractFileSystem, not FileSystem). Mirrors Hadoop's own
  * `LocalFs` = ChecksumFs(RawLocalFs(RawLocalFileSystem)). */
class NioLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))

class NioRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf, "file",
    false)

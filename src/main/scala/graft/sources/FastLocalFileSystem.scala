package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem with an in-process `chmod`.
  *
  * Hadoop's `RawLocalFileSystem.setPermission` calls
  * `NativeIO.POSIX.chmod` when the native library is loaded — and FORKS
  * a `chmod` child process per call when it is not
  * (`Shell.execCommand`, RawLocalFileSystem.java). Every `create()` and
  * every fresh `mkdirs()` level runs `setPermission` once, so on a
  * JVM without libhadoop each created file or directory pays a
  * process fork (~4–5 ms measured here) — for a partitioned write
  * landing a few hundred files that is seconds of pure fork latency,
  * dwarfing the actual I/O by ~30×.
  *
  * This subclass routes the 9 POSIX bits through
  * `java.nio.file.Files.setPosixFilePermissions` — the same syscall the
  * forked `chmod` issues, without the process — and falls back to the
  * stock (forking) path for anything NIO cannot express (sticky bit,
  * non-POSIX stores) or any NIO failure, so behavior is bit-identical.
  * `setPermission` is virtual and both call sites
  * (`LocalFSFileOutputStream`'s constructor and `mkOneDirWithMode`)
  * dispatch through it, so one override covers file creates and
  * directory creation alike.
  *
  * Wiring: `spark.hadoop.fs.file.impl = graft.sources.FastLocalFileSystem`
  * ([[graft.GraftSession]] sets it). On clusters with the native
  * library this is a no-op cost-wise (NativeIO wins either way);
  * object stores (s3a, abfs) are untouched — only the `file:` scheme
  * resolves here. Checksum semantics are unchanged:
  * [[FastLocalFileSystem]] IS a `LocalFileSystem`, wrapping the fast
  * raw store in the stock checksumming decorator.
  */
class FastRawLocalFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  /** Status reads without the `ls` fork.
    *
    * The stock status object (`DeprecatedRawLocalFileStatus`) defers
    * permission/owner/group to `loadPermissionInfo`, which without
    * libhadoop FORKS an `ls -ld` child process per file — and
    * `LocatedFileStatus`'s constructor reads `getPermission` eagerly,
    * so every `listStatus`/`listLocatedStatus` of an N-file directory
    * (Spark's InMemoryFileIndex bulk listing, commit-protocol merges,
    * maintenance file counts) paid N forks (~15 ms each; a 64-file
    * listing = ~1 s, measured as the driver gap after c12's write).
    * One NIO `readAttributes("unix:*")` call — a single stat(2) —
    * yields mode, owner, group, size and times; sticky bit included
    * (mask 0x3ff, the same bits the native-IO path keeps). Any
    * NIO failure falls back to the stock (forking) status. */
  override def getFileStatus(f: Path)
      : org.apache.hadoop.fs.FileStatus = {
    val file = pathToFile(f)
    try {
      val m = java.nio.file.Files.readAttributes(file.toPath,
        "unix:mode,size,isDirectory,lastModifiedTime,lastAccessTime," +
          "owner,group")
      val mode = m.get("mode").asInstanceOf[java.lang.Integer].intValue()
      new org.apache.hadoop.fs.FileStatus(
        m.get("size").asInstanceOf[java.lang.Long].longValue(),
        m.get("isDirectory").asInstanceOf[java.lang.Boolean].booleanValue(),
        1,
        getDefaultBlockSize(f),
        m.get("lastModifiedTime")
          .asInstanceOf[java.nio.file.attribute.FileTime].toMillis,
        m.get("lastAccessTime")
          .asInstanceOf[java.nio.file.attribute.FileTime].toMillis,
        new FsPermission((mode & 0x3ff).toShort),
        m.get("owner")
          .asInstanceOf[java.nio.file.attribute.UserPrincipal].getName,
        m.get("group")
          .asInstanceOf[java.nio.file.attribute.GroupPrincipal].getName,
        new Path(f.toString)
          .makeQualified(getUri, getWorkingDirectory))
    } catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(
          s"File $f does not exist")
      case _: Exception => super.getFileStatus(f)
    }
  }
  /** `FileSystem.rename(src, dst, options)` — the FileContext path every
    * streaming checkpoint commit rides — calls `getFileLinkStatus(src)`
    * first, and the stock implementation resolves link-ness by FORKING
    * (`FileUtil.readLink` runs `readlink`, or the `Stat` helper runs
    * `stat`) — one child process per checkpoint-file rename. A
    * non-symlink (every file this engine touches) answers through the
    * ordinary status instead; true symlinks keep the stock path. */
  override def getFileLinkStatus(f: Path)
      : org.apache.hadoop.fs.FileStatus = {
    val nio = pathToFile(f).toPath
    if (java.nio.file.Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }

  /** Directory listings route each child through the virtual
    * `getFileStatus` (fork-free above); the stock FILE branch builds
    * the deferring status directly, so cover it here too. */
  override def listStatus(f: Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    val file = pathToFile(f)
    if (file.isFile) Array(getFileStatus(f)) else super.listStatus(f)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val m: Int = permission.toShort
    // sticky/setuid/setgid bits have no PosixFilePermission — let the
    // stock implementation handle those rare calls
    if ((m & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    try {
      val perms = EnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      if ((m & 0x100) != 0) perms.add(OWNER_READ)
      if ((m & 0x080) != 0) perms.add(OWNER_WRITE)
      if ((m & 0x040) != 0) perms.add(OWNER_EXECUTE)
      if ((m & 0x020) != 0) perms.add(GROUP_READ)
      if ((m & 0x010) != 0) perms.add(GROUP_WRITE)
      if ((m & 0x008) != 0) perms.add(GROUP_EXECUTE)
      if ((m & 0x004) != 0) perms.add(OTHERS_READ)
      if ((m & 0x002) != 0) perms.add(OTHERS_WRITE)
      if ((m & 0x001) != 0) perms.add(OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath,
        perms)
      ()
    } catch {
      // UnsupportedOperationException (non-POSIX store), IOException:
      // the fallback is the stock fork — correctness over speed
      case _: Exception => super.setPermission(p, permission)
    }
  }
}

/** See [[FastRawLocalFileSystem]]. */
class FastLocalFileSystem
    extends org.apache.hadoop.fs.LocalFileSystem(
      new FastRawLocalFileSystem)

/** The AbstractFileSystem (FileContext) face of the same fix.
  *
  * Structured Streaming's checkpoint managers
  * (`FileContextBasedCheckpointFileManager`) resolve `file:` through
  * `fs.AbstractFileSystem.file.impl`, NOT `fs.file.impl` — the stock
  * binding (`o.a.h.fs.local.LocalFs`) constructs its own
  * `RawLocalFileSystem`, so without this class every offset/commit/
  * state-store file create kept forking a `chmod`, and every
  * checkpoint rename forked a `readlink`/`stat` through
  * `getFileLinkStatus` (driver stack samples showed both). Mirrors
  * `LocalFs`/`RawLocalFs` exactly, with [[FastRawLocalFileSystem]] as
  * the delegate; wired via `fs.AbstractFileSystem.file.impl` in
  * [[graft.GraftSession]]. */
class FastRawLocalFs(uri: java.net.URI,
                     conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new FastRawLocalFileSystem, conf, "file", false) {
  // the three overrides org.apache.hadoop.fs.local.RawLocalFs carries
  override def getUriDefaultPort: Int = -1
  override def isValidName(src: String): Boolean = true
}

/** See [[FastRawLocalFs]]. */
class FastLocalFs(uri: java.net.URI,
                  conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(new FastRawLocalFs(uri, conf))

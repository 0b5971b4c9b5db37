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

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

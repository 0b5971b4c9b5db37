package graft.pipeline

/** Delivery boundary for the K11 push sink (reference
  * dags/currency_etl.py:91-110): one call per (subscriber, report).
  * Implementations run on the EXECUTORS (serialized into the foreach
  * closure) and must be idempotent per (chatId, md5(caption)) — Spark's
  * foreach sinks are at-least-once under task retry.
  */
trait PushTransport extends Serializable {
  def send(chatId: Long, caption: String, media: Array[Byte]): Unit
}

/** Filesystem transport used by tests (and usable as a real spool dir
  * for an out-of-band delivery daemon): writes
  * `dir/chat_<id>.json` with the caption and `dir/chat_<id>.png` with
  * the media bytes. Idempotent — same payload overwrites in place.
  */
final class SpoolDirTransport(dir: String) extends PushTransport {
  override def send(chatId: Long, caption: String,
                    media: Array[Byte]): Unit = {
    val base = new java.io.File(dir)
    base.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(base, s"chat_$chatId.json").toPath,
      caption.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(base, s"chat_$chatId.png").toPath, media)
    ()
  }
}

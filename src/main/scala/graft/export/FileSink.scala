package graft.export

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File-per-item sink for the exporters (S9/S11), selected by URI
  * scheme: a bare path writes through java.nio (local mode, or a
  * shared NFS/FUSE mount on a cluster — the documented default
  * contract), while a scheme-qualified path (`hdfs://`, `s3a://`,
  * `file://`, any filesystem Hadoop resolves) writes through the
  * Hadoop FileSystem API, so object stores and HDFS work WITHOUT a
  * FUSE mount. Instances are built on the driver (capturing the
  * session's Hadoop configuration — credentials, endpoints) and
  * serialized into the executor closures that do the writing.
  */
sealed trait FileSink extends Serializable {
  /** Driver-side: ensure the output root exists. */
  def prepare(): Unit
  /** Executor-side: write `relPath` (may contain subdirectories)
    * under the output root, overwriting — idempotent across task
    * retries, like the exporters' nio path.
    */
  def write(relPath: String, bytes: Array[Byte]): Unit
  def writeString(relPath: String, s: String): Unit =
    write(relPath, s.getBytes(StandardCharsets.UTF_8))
}

object FileSink {

  /** True when `dir` names a filesystem Hadoop should resolve (has a
    * URI scheme). Plain paths — including relative ones — stay on nio.
    */
  private[export] def hasScheme(dir: String): Boolean =
    try new java.net.URI(dir).getScheme != null
    catch { case _: java.net.URISyntaxException => false }

  def forPath(spark: SparkSession, dir: String): FileSink =
    if (hasScheme(dir))
      new HadoopSink(dir, new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    else new NioSink(dir)

  /** PRIVATE FileSystem handles for the export sinks, one per
    * scheme+authority per JVM, created via FileSystem.newInstance with
    * checksum writing disabled on OUR handle only. `FileSystem.get`
    * returns the JVM-shared cached instance, and calling
    * `setWriteChecksum(false)` on that silently strips `.crc` writing
    * for every other user of the same filesystem in the process.
    * Handles live for the JVM's lifetime (like the shared cache's own
    * instances) — a bounded set, one per distinct export target
    * filesystem.
    *
    * ACCEPTED LIMITATION: the key ignores the Hadoop Configuration, so
    * the first caller's conf (credentials, fs tuning) is frozen in for
    * that scheme+authority for the JVM's lifetime — the same trade the
    * shared FileSystem.get cache makes. A deployment that re-targets
    * one bucket with rotating per-job credentials should construct its
    * own handle instead of relying on this cache.
    */
  private val privateFsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()
  private[export] def noCrcFileSystem(p: Path, conf: Configuration): FileSystem = {
    val uri = p.toUri
    val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    privateFsCache.computeIfAbsent(key, _ => {
      val f = FileSystem.newInstance(uri, conf)
      // ChecksumFileSystem wrappers (file:) would write .crc siblings
      // into the export tree; HDFS/object stores checksum internally
      f.setWriteChecksum(false)
      f
    })
  }
}

/** The default tier: plain java.nio writes (local paths and shared
  * mounts). Matches the exporters' historical behavior exactly.
  */
private[export] final class NioSink(dir: String) extends FileSink {
  override def prepare(): Unit =
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
  override def write(relPath: String, bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(dir, relPath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }
}

/** Scheme-qualified tier: one PRIVATE Hadoop FileSystem handle per
  * scheme+authority per executor JVM ([[FileSink.noCrcFileSystem]] —
  * never the shared `FileSystem.get` cache, whose checksum flag other
  * code in the process observes), created from the driver's serialized
  * configuration.
  */
private[export] final class HadoopSink(dir: String, conf: SerializableHadoopConf)
    extends FileSink {
  @transient private lazy val root = new Path(dir)
  @transient private lazy val fs: FileSystem =
    FileSink.noCrcFileSystem(root, conf.value)
  override def prepare(): Unit = fs.mkdirs(root)
  override def write(relPath: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(new Path(root, relPath), true)
    try out.write(bytes) finally out.close()
  }
}

/** Hadoop Configuration is Writable but not java-Serializable; this is
  * the standard wrapper pattern so executor closures can carry the
  * driver's fs settings (endpoints, credentials) instead of falling
  * back to whatever core-site.xml the executor classpath happens to
  * hold.
  */
private[export] final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

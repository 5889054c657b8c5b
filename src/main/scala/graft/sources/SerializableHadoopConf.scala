package graft.sources

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for a Hadoop Configuration so executor-side
  * FileSystem resolution (per-file sinks) sees the driver's conf —
  * the standard Writable-through-Java-serialization idiom (Hadoop's
  * Configuration itself is not java.io.Serializable). */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Hadoop [[Configuration]] is not `Serializable`; tasks that touch the
  * filesystem directly (the per-bucket bloom build/probe) need the DRIVER's
  * configuration — object-store credentials, defaultFS — not whatever a
  * bare `new Configuration()` finds on the executor classpath. Standard
  * write/readFields envelope (the same pattern Spark uses internally; its
  * own wrapper is `private[spark]`). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

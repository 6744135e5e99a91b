package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper ships
  * the session's Hadoop configuration (S3/HDFS credentials, fs.* settings)
  * into DSv2 reader factories and writer tasks via its own write/readFields
  * codec — the standard pattern for sending a Configuration with a Spark
  * closure. Without it, executor-side chunk I/O would silently run on a
  * default `new Configuration()` and drop session credentials.
  */
class SerializableHadoopConf(@transient var value: Configuration)
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

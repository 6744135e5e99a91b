package graft.util

import org.apache.hadoop.conf.Configuration

/** Ships the session's Hadoop configuration (S3/HDFS credentials, fs.*
  * settings) into DSv2 reader factories and writer tasks. Without it,
  * executor-side chunk I/O would silently run on a default
  * `new Configuration()` and drop session credentials.
  *
  * Type alias onto Spark's own `SerializableConfiguration` (public
  * `@DeveloperApi` since 2.x, identical write/readFields codec) — no
  * reason to maintain a parallel implementation.
  */
object SerializableHadoopConf {
  def apply(value: Configuration): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(value)
}

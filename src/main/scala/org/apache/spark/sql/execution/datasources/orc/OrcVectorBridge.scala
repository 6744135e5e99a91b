package org.apache.spark.sql.execution.datasources.orc

import org.apache.hadoop.hive.ql.exec.vector.{ColumnVector => HiveColumnVector}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.vectorized.ColumnVector

/** `OrcColumnVectorUtils.toOrcColumnVector` (the adapter that exposes an
  * ORC `VectorizedRowBatch` column as a Spark `ColumnVector`, with
  * repeating-row and null-mask handling) is package-private in Spark 4;
  * this bridge exposes it for graft's columnar ORC chunk reader — the
  * same pattern as `org.apache.spark.sql.graft.ColumnBridge`.
  */
object OrcVectorBridge {
  def wrap(dt: DataType, v: HiveColumnVector): ColumnVector =
    OrcColumnVectorUtils.toOrcColumnVector(dt, v)
}

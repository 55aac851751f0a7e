package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Accessor for the `private[sql]` StateStoreCoordinator bootstrap. The
  * batch state data source (`format("statestore")`) runs its partition
  * readers through `HDFSBackedStateStoreProvider.loadMap`, which reports
  * to the driver's StateStoreCoordinator RPC endpoint — an endpoint only
  * STREAMING execution registers. A fresh batch-only session reading a
  * standing checkpoint therefore dies with RpcEndpointNotFoundException
  * before it touches a single state file. Touching the query manager's
  * lazy coordinator ref registers the endpoint idempotently. Same
  * minimal-shim discipline as [[ColumnShim]]/`ListenerBusShim`.
  */
object StateCoordinatorShim {
  def ensure(spark: SparkSession): Unit = {
    spark.streams
      .asInstanceOf[org.apache.spark.sql.classic.StreamingQueryManager]
      .stateStoreCoordinator: Unit
  }
}

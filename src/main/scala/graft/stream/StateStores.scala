package graft.stream

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful operators (T6/T3/T5).
  *
  * The default HDFSBackedStateStoreProvider keeps every key's state in
  * executor heap between commits — fine for bounded session/join state,
  * but per-conversation CSR state over millions of live conversations
  * belongs in RocksDB (off-heap, spill-to-disk, incremental changelog
  * checkpointing). This is a session-level config that must be set
  * BEFORE the streaming query starts; existing checkpoints are
  * provider-specific (do not flip providers under a live checkpoint).
  */
object StateStores {

  val RocksDb: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Switch the session to RocksDB state stores with changelog
    * checkpointing (incremental uploads instead of full snapshots).
    */
  def useRocksDb(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }

  /** Restore the default heap-backed provider. */
  def useDefault(spark: SparkSession): Unit = {
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
  }

  /** Run `body` (which must START its streaming queries inside — the
    * provider is frozen into a query at start) with RocksDB state stores,
    * restoring the previous provider conf afterwards. `transformWithState`
    * requires this provider.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevCl = spark.conf.getOption(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    useRocksDb(spark)
    try body
    finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevCl match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      }
    }
  }
}

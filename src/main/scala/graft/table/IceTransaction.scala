package graft.table

import org.apache.spark.sql.DataFrame

import graft.meta.{DataFile, ManifestEntry, ManifestEntryStatus, ManifestIO}

/** Single-table transaction (reference `table/transaction.go:63-648`):
  * stage appends and property changes, commit them as ONE snapshot + one
  * metadata CAS — either everything becomes visible or nothing does.
  */
final class IceTransaction private[table] (table: IceTable) {
  private val stagedFrames = scala.collection.mutable.Buffer[DataFrame]()
  private var setProps = Map[String, String]()
  private var removeProps = Seq[String]()
  private var committed = false

  def append(df: DataFrame): IceTransaction = { stagedFrames += df; this }

  def setProperties(props: Map[String, String]): IceTransaction = {
    setProps ++= props; this
  }

  def removeProperties(keys: String*): IceTransaction = {
    removeProps ++= keys; this
  }

  /** Write staged data, then one commit carrying files + property changes.
    * Data files written before a failed CAS are unreferenced (orphan
    * cleanup collects them) — the table state itself never tears.
    */
  def commit(): Unit = {
    require(!committed, "transaction already committed")
    val files: Seq[DataFile] = stagedFrames.flatMap(df =>
      DataWriter.write(df, table.location, table.schema, table.spec, table.sortOrder,
        table.metadata.properties)).toSeq
    table.commitTransaction(files, setProps, removeProps)
    // marked committed only on SUCCESS: a transient write/CAS failure must
    // surface as itself and leave the staged transaction retryable, not
    // poison every retry with "already committed"
    committed = true
  }
}

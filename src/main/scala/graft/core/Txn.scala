package graft.core

import scala.util.{Failure, Success, Try}

/**
 * Atomic multi-operation batch over a [[LineageTable]] (reference:
 * lstore/transaction.py — Transaction.add_query / run / commit / abort).
 *
 * The reference executes queued queries one by one and aborts the whole
 * transaction when any returns False. Spark's execution model makes the
 * atomic version natural: each op is a pure LineageTable => LineageTable,
 * the composition is built lazily, and nothing is visible until the caller
 * adopts (or [[Catalog]] persists) the returned table — all-or-nothing by
 * construction, no record locks needed (reference: lstore/table.py:57's 2PL
 * lock table becomes a single-writer append discipline per table).
 */
final class Txn private (private val ops: Vector[LineageTable => LineageTable]) {

  /** Queue an operation (reference: Transaction.add_query). */
  def add(op: LineageTable => LineageTable): Txn = new Txn(ops :+ op)

  def insert(rows: org.apache.spark.sql.DataFrame): Txn = add(_.insert(rows))

  def update(pred: org.apache.spark.sql.Column,
             set: Map[String, org.apache.spark.sql.Column]): Txn = add(_.update(pred, set))

  def delete(pred: org.apache.spark.sql.Column): Txn = add(_.delete(pred))

  /** Queue a MERGE INTO (see [[LineageTable.mergeInto]]) — the upsert
    * spelling of the reference's insert+update+delete transaction. */
  def mergeInto(source: org.apache.spark.sql.DataFrame, updateCols: Seq[String],
                deleteWhen: Option[org.apache.spark.sql.Column] = None,
                notMatchedBySourceDelete: Option[org.apache.spark.sql.Column] = None,
                notMatchedBySourceUpdate: Option[(Option[org.apache.spark.sql.Column],
                  Map[String, org.apache.spark.sql.Column])] = None,
                updateWhen: Option[org.apache.spark.sql.Column] = None,
                updateColGates: Map[String, org.apache.spark.sql.Column] =
                  Map.empty): Txn =
    add(_.mergeInto(source, updateCols, deleteWhen, notMatchedBySourceDelete,
      notMatchedBySourceUpdate, updateWhen, updateColGates))

  /** Sequential composition: this transaction's ops, then `other`'s —
    * how a multi-statement SQL transaction accumulates per-table work
    * ([[graft.sql.GraftSql]] BEGIN..COMMIT) into ONE atomic commit. */
  def andThen(other: Txn): Txn = new Txn(ops ++ other.ops)

  /** Apply all queued ops; the input table is untouched (commit = adopt result). */
  def commit(table: LineageTable): LineageTable = ops.foldLeft(table)((t, op) => op(t))

  /**
   * Reference Transaction.run semantics: Right(new state) on commit,
   * Left(error) on abort — the original table stands (rollback is free,
   * nothing was mutated).
   */
  def run(table: LineageTable): Either[Throwable, LineageTable] =
    Try(commit(table)) match {
      case Success(t) => Right(t)
      case Failure(e) => Left(e)
    }
}

object Txn {
  val empty: Txn = new Txn(Vector.empty)

  /** Run many transactions sequentially against one table (reference:
    * lstore/transaction_worker.py — TransactionWorker.run), returning the
    * final state plus per-transaction commit flags. */
  def runAll(table: LineageTable, txns: Seq[Txn]): (LineageTable, Seq[Boolean]) =
    txns.foldLeft((table, Vector.empty[Boolean])) { case ((t, stats), txn) =>
      txn.run(t) match {
        case Right(next) => (next, stats :+ true)
        case Left(_)     => (t, stats :+ false)
      }
    }

  /**
   * Parallel transaction workers (reference: lstore/transaction_worker.py —
   * multiple TransactionWorkers run batches concurrently): each TABLE's
   * batch runs on its own thread against the shared [[Catalog]], every
   * transaction durably committed in batch order — concurrency across
   * tables, single-writer discipline within one (the documented model that
   * replaces the reference's record-level 2PL). Spark's scheduler accepts
   * concurrent job submission from multiple driver threads, so the tables'
   * write jobs genuinely overlap. Returns per-table commit flags.
   */
  def runBatches(catalog: Catalog,
                 batches: Map[String, Seq[Txn]]): Map[String, Seq[Boolean]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = batches.toSeq.map { case (table, txns) =>
      Future {
        table -> txns.map(txn => Try(catalog.commit(table, txn)).isSuccess)
      }
    }
    Await.result(Future.sequence(fs), Duration.Inf).toMap
  }
}

package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Model check: random-but-seeded op sequences applied BOTH to a
 * LineageTable and to a trivial driver-side model (a Map of key → value,
 * applied in order) must agree on the final snapshot — for interleavings
 * of insert / update / delete / re-insert-after-delete / increment,
 * including the shadowing rules the fixed fixtures never vary (duplicate
 * insert = deterministic upsert, delete-then-insert resurrects, update of
 * a deleted key is a no-op). Seeded generation keeps failures
 * reproducible; the op list prints on mismatch.
 */
class LineageModelSpec extends SparkSpec {

  sealed trait Op
  case class Insert(k: Long, v: Long) extends Op
  case class Update(kMod: Long, dv: Long) extends Op // v += dv where k % 3 == kMod
  case class Delete(kMod: Long) extends Op           // delete where k % 4 == kMod
  case class Increment(k: Long) extends Op
  case class Purge(kMod: Long) extends Op            // erase ALL versions, k % 5 == kMod
  /** MERGE INTO with a generated 2-row source: matched keys update v,
    * unmatched insert; rows whose v satisfies the delete gate tombstone. */
  case class Merge(k1: Long, v1: Long, k2: Long, v2: Long) extends Op

  private def genOps(seed: Long, n: Int): List[Op] = {
    val rng = new scala.util.Random(seed)
    List.fill(n)(rng.nextInt(6) match {
      case 0 => Insert(rng.nextInt(12).toLong, rng.nextInt(100).toLong)
      case 1 => Update(rng.nextInt(3).toLong, 1L + rng.nextInt(9))
      case 2 => Delete(rng.nextInt(4).toLong)
      case 3 => Increment(rng.nextInt(12).toLong)
      case 4 => Purge(rng.nextInt(5).toLong)
      case 5 =>
        // two distinct keys (source keys must be unique within one merge)
        val k1 = rng.nextInt(12).toLong
        val k2 = (k1 + 1 + rng.nextInt(11)) % 12
        Merge(k1, rng.nextInt(100).toLong, k2, rng.nextInt(100).toLong)
    })
  }

  /** The merge delete gate — a predicate on SOURCE columns. */
  private def mergeDeletes(v: Long): Boolean = v % 7 == 0

  private def applyModel(model: Map[Long, Long], op: Op): Map[Long, Long] = op match {
    case Insert(k, v) => model + (k -> v) // upsert (table-monotonic _ver)
    case Update(m, d) => model.map { case (k, v) => k -> (if (k % 3 == m) v + d else v) }
    case Delete(m)    => model.filter { case (k, _) => k % 4 != m }
    case Increment(k) => if (model.contains(k)) model + (k -> (model(k) + 1)) else model
    // purge is key-predicated here, so "any version matches" = key match;
    // NOTE a purged-then-reinserted key comes back (no tombstone), which
    // the model's plain Map semantics capture for free
    case Purge(m)     => model.filter { case (k, _) => k % 5 != m }
    case Merge(k1, v1, k2, v2) =>
      Seq((k1, v1), (k2, v2)).foldLeft(model) { case (mm, (k, v)) =>
        if (mm.contains(k) && mergeDeletes(v)) mm - k   // matched + gate → delete
        else mm + (k -> v)                              // matched → update; else insert
      }
  }

  private def applyTable(t: LineageTable, op: Op): LineageTable = {
    import spark.implicits._
    op match {
      case Insert(k, v) => t.insert(Seq((k, v)).toDF("k", "v"))
      case Update(m, d) => t.update(col("k") % 3 === m, Map("v" -> (col("v") + d)))
      case Delete(m)    => t.delete(col("k") % 4 === m)
      case Increment(k) => t.increment(col("k") === k, "v")
      case Purge(m)     => t.purge(col("k") % 5 === m)
      case Merge(k1, v1, k2, v2) =>
        t.mergeInto(Seq((k1, v1), (k2, v2)).toDF("k", "v"), Seq("v"),
          deleteWhen = Some(col("v") % 7 === 0))
    }
  }

  private def snapshotMap(t: LineageTable): Map[Long, Long] =
    t.snapshot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("snapshot equals the sequential model for random op sequences") {
    import spark.implicits._
    val base = Seq((0L, 0L), (5L, 50L), (10L, 100L)).toDF("k", "v")
    val init = Map(0L -> 0L, 5L -> 50L, 10L -> 100L)
    (1 to 12).foreach { seed =>
      val ops = genOps(seed, 8)
      val table = ops.foldLeft(LineageTable.fromBase("k", base))(applyTable)
      val model = ops.foldLeft(init)(applyModel)
      assert(snapshotMap(table) === model, s"seed $seed ops: $ops")
    }
  }

  test("vacuum preserves the model snapshot for any keep, any op sequence") {
    import spark.implicits._
    val base = Seq((0L, 0L), (5L, 50L), (10L, 100L)).toDF("k", "v")
    val init = Map(0L -> 0L, 5L -> 50L, 10L -> 100L)
    (200 to 207).foreach { seed =>
      val ops = genOps(seed, 6)
      val table = ops.foldLeft(LineageTable.fromBase("k", base))(applyTable)
      val model = ops.foldLeft(init)(applyModel)
      Seq(1, 2, 3).foreach { keep =>
        // retention must never change what a reader sees
        assert(snapshotMap(table.vacuum(keep)) === model,
          s"seed $seed keep $keep ops: $ops")
      }
      // physical bound: at most keep rows per key survive
      val counts = table.vacuum(2).lineage
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .collect().map(_.getAs[Long]("n"))
      assert(counts.forall(_ <= 2), s"seed $seed ops: $ops")
    }
  }

  test("vacuum mid-chain: later ops land on the trimmed table correctly") {
    import spark.implicits._
    val base = Seq((0L, 0L), (5L, 50L), (10L, 100L)).toDF("k", "v")
    val init = Map(0L -> 0L, 5L -> 50L, 10L -> 100L)
    (300 to 305).foreach { seed =>
      val pre = genOps(seed, 4)
      val post = genOps(seed + 1000, 4)
      // vacuum in the middle of the op chain — retention must be
      // invisible to everything downstream (ops, snapshot, delta)
      val table = post.foldLeft(
        pre.foldLeft(LineageTable.fromBase("k", base))(applyTable).vacuum(2)
      )(applyTable)
      val model = (pre ++ post).foldLeft(init)(applyModel)
      assert(snapshotMap(table) === model, s"seed $seed pre=$pre post=$post")
    }
  }

  test("asOfVersion agrees with a row-level model at EVERY version") {
    import spark.implicits._
    // The absolute-version read (time travel's backend) checked against a
    // driver-side replay of the LINEAGE itself: rows appended exactly as
    // the write semantics specify, purge removing whole keys retroactively
    // — so every historical state, not just the final snapshot, is pinned.
    case class MRow(k: Long, v: Long, ver: Long, del: Boolean)
    def live(rows: Vector[MRow], atVer: Long): Map[Long, Long] =
      rows.filter(_.ver <= atVer).groupBy(_.k)
        .flatMap { case (k, rs) =>
          val newest = rs.maxBy(_.ver)
          if (newest.del) None else Some(k -> newest.v)
        }
    def applyRows(rows: Vector[MRow], ver: Long, op: Op): Vector[MRow] = {
      val snap = live(rows, Long.MaxValue)
      op match {
        case Insert(k, v) => rows :+ MRow(k, v, ver, del = false)
        case Update(m, d) => rows ++ snap.collect {
          case (k, v) if k % 3 == m => MRow(k, v + d, ver, del = false) }
        case Delete(m) => rows ++ snap.collect {
          case (k, v) if k % 4 == m => MRow(k, v, ver, del = true) }
        case Increment(k) => rows ++ snap.get(k)
          .map(v => MRow(k, v + 1, ver, del = false))
        case Purge(m) =>
          // any version matches on the key predicate ⇒ whole keys go
          rows.filterNot(_.k % 5 == m)
        case Merge(k1, v1, k2, v2) => rows ++
          Seq((k1, v1), (k2, v2)).map { case (k, v) =>
            if (snap.contains(k) && mergeDeletes(v))
              MRow(k, snap(k), ver, del = true) // tombstone carries current
            else MRow(k, v, ver, del = false)
          }
      }
    }
    def bumps(op: Op): Boolean = op match { case _: Purge => false; case _ => true }
    val base = Seq((0L, 0L), (5L, 50L), (10L, 100L)).toDF("k", "v")
    val initRows = Vector(MRow(0, 0, 0, del = false),
      MRow(5, 50, 0, del = false), MRow(10, 100, 0, del = false))
    (400 to 405).foreach { seed =>
      val ops = genOps(seed, 7)
      var (rows, ver) = (initRows, 0L)
      ops.foreach { op =>
        if (bumps(op)) ver += 1
        rows = applyRows(rows, ver, op)
      }
      val table = ops.foldLeft(LineageTable.fromBase("k", base))(applyTable)
      (0L to ver).foreach { v =>
        val got = table.asOfVersion(v).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === live(rows, v), s"seed $seed version $v ops: $ops")
      }
    }
  }

  test("compaction preserves the model state; version reads clamp to it") {
    import spark.implicits._
    val base = Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
    val init = Map(1L -> 1L, 2L -> 2L)
    (100 to 105).foreach { seed =>
      val ops = genOps(seed, 5)
      val table = ops.foldLeft(LineageTable.fromBase("k", base))(applyTable)
      val model = ops.foldLeft(init)(applyModel)
      val compacted = table.compact
      assert(snapshotMap(compacted) === model, s"seed $seed ops: $ops")
      // compacted tables are single-version: every relative version clamps
      val v = compacted.asOfRelative(-3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(v === model, s"seed $seed ops: $ops")
    }
  }
}

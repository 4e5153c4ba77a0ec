package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch merge/upsert operators re-expressing the reference's
  * `INSERT … ON CONFLICT` family (/root/reference/apps/loader/
  * load_warehouse.py:32-119,153-180,199-202,208-278) as full-outer-join
  * merges. No driver loops — each merge is one shuffle on the key (or a
  * broadcast join when one side is dim-sized; AQE picks that at runtime).
  */
object Merge {

  /** U1/U2: NULL-preserving upsert — incoming NULLs never erase known
    * values (`SET col = COALESCE(EXCLUDED.col, old.col)`,
    * load_warehouse.py:47-48). `incoming` must be unique per key
    * (pre-apply Dedup.latestPerKey). Rows on either side survive. */
  def upsertCoalesce(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = existing.columns.filterNot(keys.contains).toSeq
    require(incoming.columns.sorted.sameElements(existing.columns.sorted),
      "upsertCoalesce: schemas must match")
    val t = existing.as("t")
    val s = incoming.as("s")
    t.join(s, keys, "full_outer")
      .select(keys.map(col) ++
        dataCols.map(c => coalesce(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** Snapshot diff (CDC): classify every key as insert / delete /
    * update between two versions of a table — the generalized form of
    * the reference's watermark export (F6 ships only inserts-by-time;
    * a diff also surfaces updates and deletes, which the loader's
    * upserts create but the export silently drops). One full-outer
    * join on the key; payload comparison is null-safe column equality
    * (`<=>`), no hashing — portable to any engine as
    * IS NOT DISTINCT FROM. Unchanged keys are filtered out, so the
    * output is change-sized, not table-sized. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      payload: Seq[String]): DataFrame =
    diffChanges(oldDf, newDf, keys, payload, withPayload = false)

  /** [[changeFeed]] carrying BOTH payload sides (`old_*` / `new_*`) —
    * what downstream DELTA consumers need: incremental aggregate
    * maintenance must subtract the old values (delete/update) and add
    * the new (insert/update), and an update may move a row between
    * groups. Same single full-outer join. */
  def changeFeedFull(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      payload: Seq[String]): DataFrame =
    diffChanges(oldDf, newDf, keys, payload, withPayload = true,
      withOldPayload = true)

  /** Shared body of [[snapshotDiff]] / [[changeFeed]] /
    * [[changeFeedFull]]: ONE full-outer key join, null-safe payload
    * compare, change-typed + change-sized output. Empty payload =
    * presence-only diff: no row can ever be an update. */
  private def diffChanges(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], payload: Seq[String],
      withPayload: Boolean, withOldPayload: Boolean = false): DataFrame = {
    val o = oldDf.select((keys ++ payload).map(col) :+
      lit(true).as("__in_old"): _*).as("o")
    val n = newDf.select((keys ++ payload).map(col) :+
      lit(true).as("__in_new"): _*).as("n")
    val allEq = payload.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .foldLeft(lit(true))(_ && _)
    val change = when(col("__in_old").isNull, lit("insert"))
      .when(col("__in_new").isNull, lit("delete"))
      .when(!allEq, lit("update"))
      .otherwise(lit("unchanged")).as("change")
    val outCols = keys.map(col) ++
      (if (withOldPayload)
        payload.map(c => col(s"o.$c").as(s"old_$c")) ++
          payload.map(c => col(s"n.$c").as(s"new_$c"))
      else if (withPayload) payload.map(c => col(s"n.$c").as(c))
      else Nil) :+ change
    o.join(n, keys, "full_outer")
      .select(outCols: _*)
      .filter(col("change") =!= "unchanged")
  }

  /** [[snapshotDiff]] with the payload attached — a consumable CDC
    * change feed: insert/update rows carry the NEW payload, delete rows
    * carry the keys (payload NULL). Same single full-outer key join and
    * change-sized output as snapshotDiff. */
  def changeFeed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      payload: Seq[String]): DataFrame =
    diffChanges(oldDf, newDf, keys, payload, withPayload = true)

  /** Apply a [[changeFeed]] to a snapshot — the CDC inverse:
    * `applyChanges(old, changeFeed(old, new)) ≡ new` (the roundtrip law,
    * MergeSpec). One left_anti join (drops updated + deleted keys) and a
    * union of the feed's insert/update payloads. The feed is
    * change-sized — at 100 TB the anti join broadcasts it or bucket-joins
    * on the snapshot's existing key layout; the snapshot itself is never
    * shuffled on a fresh partitioning. */
  def applyChanges(snapshot: DataFrame, feed: DataFrame,
      keys: Seq[String], payload: Seq[String],
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    // the feed has two consumers (anti-join probe + union branch): a
    // DERIVED feed (changeFeed's full-outer diff) would otherwise
    // execute its table-sized join twice in one action. localCheckpoint,
    // not persist: blocks self-release with the result frame, where a
    // CacheManager entry would outlive the call with no handle to drop
    val f = materialize(feed)
    snapshot.select((keys ++ payload).map(col): _*)
      .join(f, keys, "left_anti")
      .unionByName(f.filter(col("change") =!= "delete")
        .select((keys ++ payload).map(col): _*))
  }

  /** Incremental materialized-view maintenance — apply a
    * [[changeFeedFull]] to a per-group (n, sum_v) aggregate table
    * WITHOUT rescanning the base table: delete/update subtract the old
    * row's contribution, insert/update add the new one (an update that
    * moves a row between groups does both, in different groups). The
    * maintenance law `apply(agg(old), feed(old, new)) ≡ agg(new)` holds
    * EXACTLY when `sum_v` is decimal (MergeSpec asserts equality, q100
    * oracles it end-to-end).
    *
    * Scale shape: deltas aggregate feed-sized input down to touched
    * groups (map-side combined), then ONE group-keyed outer join against
    * the MV — at 100 TB the refresh cost tracks the CHANGE volume, not
    * the base table; this is q65's mergeable-partials algebra driven by
    * CDC instead of by partition. Groups emptied by deletes (n = 0)
    * leave the view. `mv` must carry (grp, n, sum_v). */
  def incrementalAggApply(mv: DataFrame, feed: DataFrame,
      grp: String, value: String): DataFrame = {
    val minus = feed.filter(col("change").isin("delete", "update"))
      .select(col(s"old_$grp").as(grp), lit(-1L).as("dn"),
        (-col(s"old_$value")).as("dv"))
    val plus = feed.filter(col("change").isin("insert", "update"))
      .select(col(s"new_$grp").as(grp), lit(1L).as("dn"),
        col(s"new_$value").as("dv"))
    val delta = minus.unionByName(plus)
      .groupBy(col(grp))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    mv.join(delta, Seq(grp), "full_outer")
      .select(col(grp),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast(mv.schema("sum_v").dataType)) +
          coalesce(col("dv"), lit(0).cast(mv.schema("sum_v").dataType)))
          .as("sum_v"))
      .filter(col("n") > 0)
  }

  /** U3: insert-if-absent (`ON CONFLICT DO NOTHING`): keep all existing
    * rows, add incoming rows whose key is unseen (left_anti = the
    * NOT-EXISTS rewrite, load_warehouse.py:199-202). */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing, keys, "left_anti")
        .select(existing.columns.map(col).toSeq: _*))

  /** U4: fact merge, latest-wins with per-column policies
    * (load_warehouse.py:263-277): `overwriteCols` are taken from the
    * incoming row when present; `coalesceCols` keep the first non-NULL of
    * (incoming, existing); `greatestCols` take the max of both sides.
    * `incoming` must already be latest-per-key. */
  def factMerge(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      overwriteCols: Seq[String],
      coalesceCols: Seq[String],
      greatestCols: Seq[String]): DataFrame = {
    val t = existing.as("t")
    // presence marker survives the outer join even when all data cols are NULL
    val sm = incoming.withColumn("__s_present", lit(1)).as("s")
    t.join(sm, keys, "full_outer")
      .select(keys.map(col) ++
        overwriteCols.map(c =>
          when(col("__s_present").isNotNull, col(s"s.$c"))
            .otherwise(col(s"t.$c")).as(c)) ++
        coalesceCols.map(c => coalesce(col(s"s.$c"), col(s"t.$c")).as(c)) ++
        greatestCols.map(c => greatest(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** U5: retention purge — staging rewritten to rows newer than cutoff
    * (load_warehouse.py:281). */
  /** Slowly-changing-dimension type 2: turn a change stream
    * (key, attrs, event order) into versioned history rows with
    * `[valid_from, valid_to)` intervals and an `is_current` flag — the
    * time-travel answer the reference's overwrite-only dims
    * (load_warehouse.py:32-49, latest wins, history lost) cannot give.
    *
    * Consecutive rows with identical `attrs` collapse into one version
    * (an upsert that changes nothing opens no interval). `orderCols`
    * must totally order each key's changes. One shuffle: both window
    * passes (change detection, interval close) share the key
    * partitioning. */
  def scd2(changes: DataFrame, keys: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      validFrom: org.apache.spark.sql.Column,
      attrs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val a = struct(attrs.map(col): _*)
    val kept = changes
      .withColumn("__chg", !(lag(a, 1).over(w) <=> a)) // null-safe: first row true
      .filter(col("__chg"))
      .drop("__chg")
    kept
      .withColumn("valid_from", validFrom)
      .withColumn("valid_to", lead(validFrom, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  def purge(staging: DataFrame, ingestCol: String, cutoff: org.apache.spark.sql.Column): DataFrame =
    staging.filter(col(ingestCol) > cutoff)

  /** Per-bucket reconciliation fingerprint — the cheap cross-engine /
    * cross-copy table comparison that [[snapshotDiff]]'s full-outer join
    * is too expensive for at 100 TB: each bucket reduces to (row count,
    * order-free checksum), two tables match iff every bucket row
    * matches, and a mismatch names the bucket to diff precisely (run
    * snapshotDiff on that slice only).
    *
    * Checksum = Σ md5-derived 60-bit integers over the canonicalized
    * row rendering — commutative, so partitioning/order/retries don't
    * matter, and md5 makes it portable to any engine (the library's
    * shared hashing vocabulary). Sums run as decimal(38,0): 2^60-sized
    * terms overflow a long within 300 rows. NULLs render as an explicit
    * sentinel — concat_ws silently DROPS nulls, which would collide
    * (a,NULL,b) with (a,b,NULL). Render doubles/timestamps to fixed
    * strings before passing them in (q43's export-render contract). */
  def tableChecksum(df: DataFrame, parts: Seq[org.apache.spark.sql.Column],
      bucket: org.apache.spark.sql.Column): DataFrame = {
    val canon = concat_ws("|",
      parts.map(c => coalesce(c.cast("string"), lit("␀"))): _*)
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.expr.Similarity.md5PrefixLong(canon, 15).cast("decimal(38,0)")).as("checksum"))
  }
}

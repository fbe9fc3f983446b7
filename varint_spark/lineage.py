"""Per-partition lineage + checkpoint/resume for the encode job.

North-rule requirement: a killed job resumes without re-encoding completed
partitions, with lineage rows (partition id, codec chosen, input/output
bytes, digest) per partition.

Storage layout (Iceberg-style commit semantics over plain parquet — the
image has no Iceberg jars; ``_iceberg_available`` gates the real connector):

    <root>/blocks/part_key=<k>/*.parquet   — encoded block rows
    <root>/lineage/*.parquet               — one row per (part_key, column)

Protocol:

1. Pending work = distinct (bucket, salt) keys of the input **anti-joined**
   against the committed lineage's part_keys (broadcast — lineage is tiny).
2. Blocks are written with *dynamic partition overwrite*, so re-encoding a
   partition after a crash replaces its directory instead of duplicating
   rows (idempotent because block contents are deterministic —
   tests/test_engine_e2e.py::test_determinism_across_parallelism).
3. Lineage rows are appended only after the block write commits; a crash
   between the two leaves orphan block dirs that the next run simply
   overwrites.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import EncodeOptions, encode_transcripts, lineage_summary, with_partition_keys


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


def _part_key_col() -> F.Column:
    # Must match the engine UDF's Python f"{bucket:06d}:{salt:04d}" exactly:
    # printf %d semantics widen (never truncate) for >=5-digit or negative
    # salts, where lpad would truncate '12345' -> '1234' and collide keys.
    return F.format_string("%06d:%04d", F.col("_bucket"), F.col("_salt"))


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    p = Path(root) / "lineage"
    if not p.exists() or not any(p.glob("*.parquet")):
        return None
    # mergeSchema: stores written before commit tagging mix files with and
    # without the commit column; absent values read as commit 0 (the
    # pre-history epoch), so old stores stay snapshot-readable
    lin = spark.read.option("mergeSchema", "true").parquet(str(p))
    if "commit" not in lin.columns:
        lin = lin.withColumn("commit", F.lit(0))
    return lin.withColumn("commit", F.coalesce(F.col("commit"), F.lit(0)))


def read_blocks(spark: SparkSession, root: str) -> DataFrame:
    # Schema-drift guard (ADVICE r6): an r6+ resume append into an older
    # store mixes block files with and without the r6 stat columns
    # (sum_val/bloom/hll); footer SAMPLING may pick an old file and drop
    # the new columns nondeterministically, breaking the stats-dependent
    # readers (aggregate_blocks, prune_chunks_bloom). Pay the full
    # mergeSchema footer scan ONLY when the sampled schema is actually
    # missing engine columns — a uniform store (the overwhelmingly common
    # case) costs nothing extra; a mixed store reads every footer once
    # and old files null-fill the new stat columns (the same semantics a
    # chunk without sidecars already has).
    from .engine import BLOCK_SCHEMA_DDL
    p = str(Path(root) / "blocks")
    df = spark.read.parquet(p)
    want = [f.strip().split()[0] for f in BLOCK_SCHEMA_DDL.split(",")]
    if any(c not in df.columns for c in want):
        df = spark.read.option("mergeSchema", "true").parquet(p)
    return df


# --- commit manifests: crash-atomic multi-file commits ---------------------
#
# A logical commit touches several files (lineage append, delete-log
# appends across stores, an overlay encode). The marker file
# <root>/commits/<id> is written LAST; readers honor only manifested
# commit ids, so a crash mid-commit leaves every partial write INVISIBLE
# (the table reads as if the commit never started) rather than
# half-applied. The next operation takes a fresh id (next_commit scans
# partials too), so crashed ids are never reused; their garbage stays
# invisible forever. Stores written before manifests existed have no
# commits dir and read ungated; the first manifest-aware write backfills
# markers for every id already present (those were fully readable, hence
# fully committed, under the single-writer assumption).


def committed_ids(root: str) -> set[int] | None:
    """Manifested commit ids, or None for a legacy store (no commits
    dir => no gating)."""
    p = Path(root) / "commits"
    if not p.exists():
        return None
    return {int(f.name) for f in p.iterdir() if f.name.isdigit()}


def _write_manifest(root: str, commit: int) -> None:
    p = Path(root) / "commits"
    p.mkdir(parents=True, exist_ok=True)
    (p / str(commit)).touch()


def _ensure_manifests(spark: SparkSession, root: str) -> None:
    """Upgrade a legacy store in place: backfill a marker for every
    commit id already observable (they were readable before, hence fully
    committed)."""
    if committed_ids(root) is not None:
        return
    ids = {0}
    lin = read_lineage(spark, root)
    if lin is not None:
        ids |= {r.commit for r in lin.select("commit").distinct().collect()}
    log = read_delete_log(spark, root)
    if log is not None:
        ids |= {r.commit for r in log.select("commit").distinct().collect()}
    for c, od in _overlay_commits(root):
        ids.add(c)
        log = read_delete_log(spark, od)
        if log is not None:
            ids |= {r.commit
                    for r in log.select("commit").distinct().collect()}
    for c in ids:
        _write_manifest(root, c)


def _gate_commits(df: DataFrame, allowed: set[int] | None) -> DataFrame:
    """Keep rows whose commit id is manifested (commit 0 — the
    pre-manifest epoch — always passes).

    The predicate is a RANGE over the contiguous manifested prefix plus
    an isin() of only the out-of-order tail (ids above the first gap —
    crashed ids never reused, so the tail is empty or tiny). Inlining
    every id (r6) grew the plan O(total commits) for the lifetime of the
    table: a streaming store at one commit per micro-batch degraded every
    snapshot read's planning time — ADVICE r6."""
    if allowed is None:
        return df
    hi = 0
    while (hi + 1) in allowed:
        hi += 1
    cond = F.col("commit") <= hi  # covers the pre-manifest epoch 0 too
    extras = sorted(int(x) for x in allowed if x > hi)
    if extras:
        cond = cond | F.col("commit").isin(extras)
    return df.filter(cond)


def encode_checkpointed(df: DataFrame, root: str,
                        opts: EncodeOptions = EncodeOptions(),
                        kinds: dict[str, str] | None = None, shared=None) -> dict:
    """Encode ``df`` into <root>, skipping partitions already committed to
    lineage. Returns a summary dict (partitions done/skipped + the commit
    id this run was tagged with).

    Append contract: rows landing in an ALREADY-COMMITTED (bucket, salt)
    partition are skipped with it — resume semantics assume the input is
    the same table re-run. Appends must map to NEW part_keys, which
    time-ordered data does naturally (a growing order column yields fresh
    salt groups); align batch boundaries to ``salt_span`` to keep a batch
    from straddling a committed salt group."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    _ensure_manifests(spark, root)

    keyed = with_partition_keys(df, opts).withColumn("_part_key", _part_key_col())
    # resume trusts only MANIFESTED lineage: a crash between the lineage
    # append and the manifest leaves rows that readers ignore — those
    # partitions must re-encode, not be skipped into invisibility
    lin = read_lineage(spark, root)
    if lin is not None:
        lin = _gate_commits(lin, committed_ids(root))
    skipped = 0
    if lin is not None:
        done = lin.select("part_key").distinct()
        skipped = done.count()
        keyed = keyed.join(
            F.broadcast(done.withColumnRenamed("part_key", "_part_key")),
            on="_part_key", how="left_anti",
        )
    pending = keyed.drop("_part_key", "_bucket", "_salt")
    blocks = encode_transcripts(pending, opts, kinds=kinds, shared=shared).cache()
    try:
        blocks_dir = str(Path(root) / "blocks")
        (
            blocks.withColumn("pk", F.col("part_key"))
            .write.mode("overwrite")
            .partitionBy("pk")
            .parquet(blocks_dir)
        )
        # commit lineage only after the block write succeeded. The summary
        # comes from THIS RUN's cached block rows, not a read-back of the
        # whole store: the r6 read-back + anti-join re-scanned every file
        # ever committed on each commit (O(store) per commit at scale) and
        # could resurrect orphan partitions of a crashed run that the
        # current input no longer covers. Cached bytes == written bytes by
        # the block-determinism invariant, so the lineage is exact.
        commit = next_commit(spark, root)
        new_lineage = lineage_summary(blocks).withColumn("commit", F.lit(commit))
        new_lineage.write.mode("append").parquet(str(Path(root) / "lineage"))
        done_now = new_lineage.select("part_key").distinct().count()
        _write_manifest(root, commit)
    finally:
        blocks.unpersist()
    return {"partitions_encoded": done_now, "partitions_skipped": skipped,
            "commit": commit}


def vacuum(spark: SparkSession, root: str, dry_run: bool = False,
           orphan_overlays: bool = False) -> dict:
    """Garbage-collect block partition directories that no committed
    lineage row references — the debris a crash between the block write
    and the lineage append leaves behind (protocol step 3 above). Normally
    the next run's dynamic-partition overwrite replaces them, but a
    pipeline that never re-runs (or re-runs with a narrower input) keeps
    paying their storage forever; ``vacuum`` is the explicit reclaim, the
    same contract as Delta/Iceberg VACUUM: only UNREFERENCED partition
    dirs are touched, so readers of committed data are never affected.

    ``orphan_overlays=True`` additionally removes overlay stores whose
    creation commit is NOT manifested — the invisible leftovers of a
    crashed upsert. Opt-in because it assumes NO writer is active: an
    in-flight upsert's overlay is unmanifested until its final marker,
    and a concurrent vacuum would destroy it (the whole lineage layer is
    single-writer; vacuum is a maintenance window op).

    Driver-side work is directory-listing sized (one name per partition,
    the same budget the resume anti-join already spends). Returns
    ``{"orphans": [...], "removed": n, "orphan_overlays": [...]}``;
    ``dry_run`` lists without deleting."""
    import shutil
    from urllib.parse import unquote

    # Spark escapes partition values URI-style on disk (":" -> "%3A");
    # lineage part_keys are the logical form — unquote before comparing
    blocks_dir = Path(root) / "blocks"
    on_disk = {unquote(p.name.split("=", 1)[1]): p
               for p in blocks_dir.glob("pk=*") if p.is_dir()} \
        if blocks_dir.exists() else {}
    lin = read_lineage(spark, root)
    committed = set() if lin is None else {
        r.part_key for r in lin.select("part_key").distinct().collect()}
    orphans = sorted(k for k in on_disk if k not in committed)
    if not dry_run:
        for k in orphans:
            shutil.rmtree(on_disk[k])

    dead_overlays: list[int] = []
    if orphan_overlays:
        allowed = committed_ids(root)
        if allowed is not None:  # a legacy store has no crashed commits
            for c, od in _overlay_commits(root):
                if c not in allowed:
                    dead_overlays.append(c)
                    if not dry_run:
                        shutil.rmtree(od)
    return {"orphans": orphans,
            "removed": 0 if dry_run else len(orphans) + len(dead_overlays),
            "orphan_overlays": dead_overlays}


# ---------------------------------------------------------------------------
# Commit log + snapshot (time-travel) reads
#
# One monotonically increasing commit counter covers BOTH kinds of table
# change: encode runs (lineage rows tagged `commit`) and row-level deletes
# (delete-log rows tagged `commit`). A snapshot at version v is therefore
# exact for append+delete histories: the partitions whose lineage commit
# is <= v, minus the deletion vectors whose commit is <= v. Re-encoding an
# EXISTING part_key (dynamic overwrite) physically replaces its bytes, so
# history before the overwrite is not reconstructable for that partition —
# the documented Iceberg-without-Iceberg limit of this plain-parquet layout.


def _overlay_commits(root: str) -> list[tuple[int, str]]:
    """(commit, path) of the merge-on-read overlay stores under
    <root>/overlays/<commit>, ascending."""
    p = Path(root) / "overlays"
    if not p.exists():
        return []
    return sorted((int(d.name), str(d)) for d in p.iterdir()
                  if d.is_dir() and d.name.isdigit())


def next_commit(spark: SparkSession, root: str) -> int:
    """1 + the highest commit across the lineage, the delete log, and any
    overlay stores (their creation ids and delete logs) — driver work is
    a few metadata-sized maxes."""
    mx = 0
    lin = read_lineage(spark, root)
    if lin is not None:
        mx = lin.agg(F.max("commit")).first()[0] or 0
    for d in [root] + [od for _, od in _overlay_commits(root)]:
        log = read_delete_log(spark, d)
        if log is not None:
            mx = max(mx, log.agg(F.max("commit")).first()[0] or 0)
    for c, _ in _overlay_commits(root):
        mx = max(mx, c)
    return mx + 1


def read_delete_log(spark: SparkSession, root: str) -> DataFrame | None:
    p = Path(root) / "deletes"
    if not p.exists() or not any(p.glob("*.parquet")):
        return None
    return spark.read.parquet(str(p))


def delete_checkpointed(dv: DataFrame, root: str,
                        commit: int | None = None,
                        write_manifest: bool = True) -> dict:
    """Commit a deletion-vector table (varint_spark.deletes.delete_where /
    merge_dv output) to <root>/deletes, tagged with the next commit id
    (or an explicit ``commit`` — upserts stamp one id across stores and
    pass ``write_manifest=False``, manifesting once at the end).
    Append-only, manifest written last — a crash mid-append leaves rows
    readers ignore (unmanifested id), never a half-applied delete."""
    spark = dv.sparkSession
    _ensure_manifests(spark, root)
    if commit is None:
        commit = next_commit(spark, root)
    tagged = dv.withColumn("commit", F.lit(commit))
    tagged.write.mode("append").parquet(str(Path(root) / "deletes"))
    stats = tagged.agg(F.count("*"), F.sum("n_deleted")).first()
    if write_manifest:
        _write_manifest(root, commit)
    return {"commit": commit, "chunks": stats[0],
            "rows_deleted": stats[1] or 0}


def read_deletes(spark: SparkSession, root: str,
                 as_of: int | None = None,
                 allowed: set[int] | None = None) -> DataFrame | None:
    """The merged deletion-vector state at version ``as_of`` (latest when
    None): one vector per touched chunk, commits OR-folded container-level
    (varint_spark.deletes.merge_dv). ``allowed``: manifested commit ids —
    unmanifested (crashed) delete appends are ignored."""
    from .deletes import merge_dv

    log = read_delete_log(spark, root)
    if log is None:
        return None
    log = _gate_commits(log, allowed)
    if as_of is not None:
        log = log.filter(F.col("commit") <= as_of)
    return merge_dv(log.drop("commit"))


def _read_snapshot_single(spark: SparkSession, root: str, schema_ddl: str,
                          as_of: int | None, kinds, shared, columns,
                          missing_ok: bool,
                          dv_allowed: set[int] | None) -> DataFrame:
    lin = read_lineage(spark, root)
    if lin is None:
        raise ValueError(f"no committed lineage under {root!r}")
    from .engine import decode_blocks

    # lineage gates by THIS store's manifests (an overlay numbers its
    # own encode runs); DV rows carry GLOBAL ids — a delete can manifest
    # in this store's dir (standalone) or the base's (upsert), so gate
    # by the union of the two
    own = committed_ids(root)
    lin = _gate_commits(lin, own)
    if as_of is not None:
        lin = lin.filter(F.col("commit") <= as_of)
    part_keys = lin.select("part_key").distinct()
    blocks = read_blocks(spark, root).drop("pk").join(
        F.broadcast(part_keys), on="part_key", how="left_semi")
    dv_ids = None if (own is None and dv_allowed is None) \
        else (own or set()) | (dv_allowed or set())
    dv = read_deletes(spark, root, as_of=as_of, allowed=dv_ids)
    return decode_blocks(blocks, schema_ddl, kinds=kinds, shared=shared,
                         columns=columns, missing_ok=missing_ok, deletes=dv)


def read_snapshot(spark: SparkSession, root: str, schema_ddl: str,
                  as_of: int | None = None,
                  kinds: dict[str, str] | None = None, shared=None,
                  columns: list[str] | None = None,
                  missing_ok: bool = False) -> DataFrame:
    """Decode the table as of commit ``as_of`` (latest when None):
    committed partitions with lineage commit <= as_of, minus deletion
    vectors with commit <= as_of, plus merge-on-read overlay stores
    created at commit <= as_of (each read under the same version — an
    overlay row upserted over again is DV-masked by the later commit,
    so last-writer-wins per key holds at every version). The partition
    filters are broadcast semi-joins against metadata; everything else
    is the ordinary distributed decode path."""
    base_allowed = committed_ids(root)
    overlays = [(c, od) for c, od in _overlay_commits(root)
                if (as_of is None or c <= as_of)
                and (base_allowed is None or c in base_allowed)]
    parts: list[DataFrame] = []
    try:
        parts.append(_read_snapshot_single(spark, root, schema_ddl, as_of,
                                           kinds, shared, columns, missing_ok,
                                           base_allowed))
    except ValueError:
        if not overlays:  # nothing at all under this root
            raise
    for _, od in overlays:
        parts.append(_read_snapshot_single(spark, od, schema_ddl, as_of,
                                           kinds, shared, columns, missing_ok,
                                           base_allowed))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def upsert_checkpointed(df: DataFrame, root: str,
                        opts: EncodeOptions = EncodeOptions(),
                        kinds: dict[str, str] | None = None,
                        shared=None, dedup_col: str | None = None) -> dict:
    """Merge-on-read UPSERT (the MERGE INTO ... WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT shape): rows keyed by (group_col, order_col)
    replace any stored row with the same key and insert otherwise —
    without rewriting a single payload block. One commit id stamps the
    whole operation:

    1. position deletes: the batch's key set semi-joins the stored KEY
       columns (base + every earlier overlay; payload columns never
       read — varint_spark.deletes.delete_matching_keys) and the hit
       offsets land as DV appends tagged with this commit;
    2. the batch itself encodes into its own overlay store
       <root>/overlays/<commit> (fresh part_keys — no salt collision
       with the base).

    ``read_snapshot`` unions base + overlays at any version, so history
    stays exact: a snapshot before this commit shows the old rows, one
    at-or-after shows exactly the new ones. Overlay proliferation is the
    usual MoR trade — fold overlays back with compact_blocks + a base
    re-encode when their count grows.

    ``dedup_col``: a batch carrying several rows for one key (CDC
    updates) keeps only the row with the greatest ``dedup_col`` per key
    (make the sequence unique); without it the batch must be key-unique
    or duplicate keys both survive as visible rows."""
    from .deletes import delete_matching_keys
    from .engine import kinds_for_schema

    spark = df.sparkSession
    if dedup_col is not None:
        from pyspark.sql import Window
        w = Window.partitionBy(opts.group_col, opts.order_col) \
            .orderBy(F.col(dedup_col).desc())
        df = df.withColumn("_rn", F.row_number().over(w)) \
            .filter(F.col("_rn") == 1).drop("_rn")
    _ensure_manifests(spark, root)
    commit = next_commit(spark, root)
    kinds = kinds or kinds_for_schema(df.schema)
    key_cols = [opts.group_col, opts.order_col]
    key_kinds = {c: kinds[c] for c in key_cols}
    keys = df.select(*key_cols).distinct()

    base_allowed = committed_ids(root)
    targets = []
    if (Path(root) / "blocks").exists():
        targets.append(root)
    # manifested overlays only: a crashed overlay is invisible to reads,
    # so marking its rows would be wasted sidecar bytes
    targets += [od for c, od in _overlay_commits(root)
                if c < commit and (base_allowed is None or c in base_allowed)]
    rows_replaced = 0
    for t in targets:
        blocks = read_blocks(spark, t).drop("pk")
        # current VISIBLE state only: a crashed commit's unmanifested
        # vectors don't apply, so their rows must be re-marked here
        own = committed_ids(t)
        dv_ids = None if (own is None and base_allowed is None) \
            else (own or set()) | (base_allowed or set())
        dv = delete_matching_keys(
            blocks, keys, key_kinds,
            deletes=read_deletes(spark, t, allowed=dv_ids))
        # one manifest covers the whole upsert — written LAST, in the
        # base, so a crash anywhere in this loop (or in the overlay
        # encode below) leaves every partial write invisible
        rows_replaced += delete_checkpointed(
            dv, t, commit=commit, write_manifest=False)["rows_deleted"]

    overlay_root = str(Path(root) / "overlays" / f"{commit:06d}")
    enc = encode_checkpointed(df, overlay_root, opts, kinds=kinds,
                              shared=shared)
    _write_manifest(root, commit)
    return {"commit": commit, "rows_replaced": rows_replaced,
            "partitions_encoded": enc["partitions_encoded"]}


def delete_where_checkpointed(spark: SparkSession, root: str,
                              filter_col: str, kind: str = "int64",
                              lo: int | None = None, hi: int | None = None,
                              eq: str | None = None, prefix: str | None = None,
                              isin: list[str] | None = None,
                              like: str | None = None, shared=None) -> dict:
    """Table-level DELETE WHERE for a merge-on-read store: the predicate
    (same surface as varint_spark.deletes.delete_where, evaluated on the
    ENCODED form) runs against the base and every manifested overlay, and
    all resulting vectors land under ONE commit id, manifested last —
    crash-atomic like every other table op. Returns the commit id and
    rows deleted per store.

    Metadata pruning runs automatically first: zone maps for lo/hi,
    string zones for eq/prefix, Bloom sidecars for eq (all sound —
    absent stats keep the chunk) — so at 100 TB a selective delete never
    ships non-intersecting chunks' predicate blocks off disk."""
    _ensure_manifests(spark, root)
    from .deletes import delete_where as _dw
    from .engine import prune_chunks, prune_chunks_bloom, prune_chunks_str

    commit = next_commit(spark, root)
    base_allowed = committed_ids(root)
    targets = []
    if (Path(root) / "blocks").exists():
        targets.append(root)
    targets += [od for c, od in _overlay_commits(root)
                if base_allowed is None or c in base_allowed]
    if not targets:
        raise ValueError(f"no committed data under {root!r}")
    rows = 0
    for t in targets:
        blocks = read_blocks(spark, t).drop("pk")
        if (lo is not None or hi is not None) and kind != "str":
            blocks = prune_chunks(blocks, filter_col, lo=lo, hi=hi)
        elif kind == "str" and (eq is not None or prefix is not None):
            blocks = prune_chunks_str(blocks, filter_col, eq=eq,
                                      prefix=prefix)
            if eq is not None:  # no-sidecar chunks are kept, always sound
                blocks = prune_chunks_bloom(blocks, filter_col, eq,
                                            kind="str")
        dv = _dw(blocks, filter_col, kind=kind, lo=lo, hi=hi, eq=eq,
                 prefix=prefix, isin=isin, like=like, shared=shared)
        rows += delete_checkpointed(dv, t, commit=commit,
                                    write_manifest=False)["rows_deleted"]
    _write_manifest(root, commit)
    return {"commit": commit, "rows_deleted": rows}


def flatten_checkpointed(spark: SparkSession, root: str, new_root: str,
                         schema_ddl: str,
                         opts: EncodeOptions = EncodeOptions(),
                         kinds: dict[str, str] | None = None,
                         shared=None, as_of: int | None = None) -> dict:
    """The merge-on-read maintenance pass: materialize the table at
    ``as_of`` (latest when None) into a FRESH single store — no overlays,
    no deletion vectors, one lineage — so read amplification from
    accumulated upserts resets to zero. Non-destructive: the old root
    (and its whole history) stays intact; cut readers over to
    ``new_root``, then drop the old directory when nothing reads it.
    Row set is exactly ``read_snapshot(root, as_of)`` (tested); the
    rewrite re-partitions by (group, order) through the ordinary encode
    path, so the new store obeys every engine invariant (determinism,
    cost gate, zone maps) as if the merged table had been encoded in one
    shot."""
    snap = read_snapshot(spark, root, schema_ddl, as_of=as_of,
                         kinds=kinds, shared=shared)
    res = encode_checkpointed(snap, new_root, opts, kinds=kinds,
                              shared=shared)
    res["source_as_of"] = as_of
    return res

"""Crash-safe commit protocol for small foreachBatch state tables.

The streaming sketch maintainers (theta, CMS, and friends) persist their
bounded state as a parquet directory that is atomically replaced every
micro-batch. The naive two-rename swap

    os.rename(table, old); os.rename(staging, table)

has two crash holes:

1. A crash BETWEEN the renames leaves ``table`` missing — the next batch
   silently rebuilds state from scratch (data loss, no error).
2. A replay marker created AFTER the swap means a crash in that window
   re-folds the batch on replay — double-counting for sum-merged state
   (CMS cells).

This module closes both with one idea: **the folded batch id travels
inside the staged table itself** (``_meta.json``, written only after the
parquet write succeeds, so its presence == "staging is complete"). The
directory swap is then the single commit point — state and replay marker
become visible atomically, and recovery can always tell a complete
staging from a partial one.

Protocol per batch:

    recover(table)                      # heal any interrupted prior swap
    if batch_id <= last_folded(table):  # replay — already committed
        return
    <write merged parquet to staging>
    <write staging/_meta.json>          # completeness sentinel + batch id
    swap(staging, table)                # rename table->old, staging->table

Recovery cases (``recover``):
- ``table`` present: prior commit finished; clean stray staging/old dirs.
- ``table`` missing, a COMPLETE staging exists (has ``_meta.json``): the
  crash hit between the two renames — promote the staging (it already
  contains the crashed batch's fold; a foreachBatch replay of that batch
  is then skipped by the meta check).
- ``table`` missing, only an ``__old__`` dir: roll back to the old state.
- ``table`` missing, only partial stagings: first ever batch crashed
  mid-write — nothing to restore, clean up.

Spark's parquet reader ignores ``_``-prefixed files, so ``_meta.json``
rides inside the table directory without affecting reads.

Local-filesystem ``os.rename`` is atomic; on object stores the same seam
is served by the manifest-commit protocol in ``sinks/tables.py`` (see
``write_table_manifest_commit``). This helper is for driver-local
checkpoint-adjacent state, which Structured Streaming already requires to
be on a real filesystem.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

_META = "_meta.json"


def _is_complete(staging_dir: str) -> bool:
    return os.path.exists(os.path.join(staging_dir, _META))


def _legacy_marker_dirs(table: str) -> list[str]:
    """Marker dirs from the pre-``_meta.json`` protocol.

    The first maintainer generation recorded replays as sibling dirs of
    the table — ``<parent>/_batch_<n>`` next to ``<parent>/sketch`` —
    created AFTER the swap. They are invisible to the new swap (which only
    touches ``table``), so without migration an upgraded state dir reports
    ``last_folded() == -1`` and a foreachBatch replay of the last committed
    batch re-folds it once — double-counting sum-merged CMS/agg-view state.
    """
    parent = os.path.dirname(table.rstrip("/")) or "."
    out = []
    for d in glob.glob(os.path.join(parent, "_batch_*")):
        tail = os.path.basename(d)[len("_batch_"):]
        if tail.isdigit():
            out.append(d)
    return out


def _legacy_last_folded(table: str) -> int:
    markers = _legacy_marker_dirs(table)
    if not markers or not os.path.exists(table):
        # markers without a table mean the legacy state itself was lost
        # (legacy crash hole #1); treating them as authoritative would skip
        # folding batches into the rebuilt-empty state — worse than a
        # single re-fold, so ignore them.
        return -1
    return max(int(os.path.basename(d)[len("_batch_"):]) for d in markers)


def recover(table: str) -> None:
    """Heal an interrupted swap so ``table`` reflects the last durable
    commit, then remove every stray staging/old directory.

    Also migrates a pre-protocol table in place: when ``table`` exists but
    has no ``_meta.json`` and legacy ``_batch_N`` sibling markers are
    present, their max batch id is written into the table's own meta. The
    markers are *parent*-scoped and may be shared by a sibling table (e.g.
    one state_path hosting both ``cells`` and ``bins``), so the migration
    makes this table self-describing without touching the markers —
    :func:`commit` only deletes them once no meta-less sibling could still
    need them (round-6 ADVICE)."""
    stagings = glob.glob(f"{table}.__staging__.*")
    olds = glob.glob(f"{table}.__old__.*")
    if not os.path.exists(table):
        complete = [s for s in stagings if _is_complete(s)]
        if complete:
            # crash between the two renames: staging holds old ∪ batch and
            # its meta carries the batch id, so promoting it both restores
            # state and marks the batch folded
            winner = max(complete, key=os.path.getmtime)
            os.rename(winner, table)
            stagings.remove(winner)
        elif olds:
            winner = max(olds, key=os.path.getmtime)
            os.rename(winner, table)
            olds.remove(winner)
    for d in stagings + olds:
        shutil.rmtree(d, ignore_errors=True)
    if os.path.exists(table) and not _is_complete(table):
        legacy = _legacy_last_folded(table)
        if legacy >= 0:
            with open(os.path.join(table, _META), "w", encoding="utf-8") as f:
                json.dump({"last_batch_id": legacy}, f)


def _has_meta_less_sibling(table: str) -> bool:
    """True if the table's parent holds another directory that looks like a
    still-unmigrated state table — one that may still need the shared
    legacy ``_batch_N`` markers to report its replay position. Unknown
    directories count as siblings (safe: markers are kept, never lost)."""
    parent = os.path.dirname(table.rstrip("/")) or "."
    me = os.path.basename(table.rstrip("/"))
    for name in os.listdir(parent):
        if name == me or name.startswith("_batch_"):
            continue
        if ".__staging__." in name or ".__old__." in name:
            continue
        path = os.path.join(parent, name)
        if os.path.isdir(path) and not _is_complete(path):
            return True
    return False


def last_folded(table: str) -> int:
    """Batch id recorded in the table's meta; for a pre-protocol table
    (no ``_meta.json``) falls back to the legacy ``_batch_N`` sibling
    marker dirs; -1 for fresh state."""
    path = os.path.join(table, _META)
    if not os.path.exists(path):
        return _legacy_last_folded(table)
    with open(path, encoding="utf-8") as f:
        return int(json.load(f)["last_batch_id"])


def commit(merged, table: str, batch_id: int) -> None:
    """Write ``merged`` (a DataFrame) as the new state of ``table`` with
    the batch id embedded, via complete-staging + swap. Callers must have
    run :func:`recover` and the :func:`last_folded` replay check first."""
    staging = f"{table}.__staging__.{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    # sentinel LAST: meta present == staging complete (and replayable-safe)
    with open(os.path.join(staging, _META), "w", encoding="utf-8") as f:
        json.dump({"last_batch_id": batch_id}, f)
    old = f"{table}.__old__.{uuid.uuid4().hex[:8]}"
    if os.path.exists(table):
        os.rename(table, old)
        os.rename(staging, table)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, table)
    # first new-protocol commit supersedes any legacy sibling markers — but
    # they are parent-scoped and another meta-less table under the same
    # parent may still be reading them (round-6 ADVICE), so drop them only
    # once every sibling table is self-describing
    if not _has_meta_less_sibling(table):
        for d in _legacy_marker_dirs(table):
            shutil.rmtree(d, ignore_errors=True)

"""Generation-manifest indirection for the index table set.

The Lucene ``segments_N`` / Iceberg metadata-pointer analog: one small
``GENERATION`` JSON file maps each LOGICAL table name (postings,
term_stats, docs, ...) to its current PHYSICAL directory
(``postings@3``, ...). Rewriting operations (compaction, purge) stage a
complete new generation side-by-side and commit it with a single atomic
``os.replace`` of the pointer — the ONLY mutation any reader can
observe. Consequences:

- **Cross-table atomicity for concurrent readers** (ADVICE r3): an
  ``IndexReader`` snapshots the pointer once at construction and
  resolves every table — including ``corpus_stats.json`` and the
  tombstone set — through that snapshot, so a reader constructed at any
  instant sees one consistent generation. The r3 contract ("a reader
  constructed mid-swap can pair purged postings with pre-purge corpus
  stats") is now impossible by construction, not by convention.
- **Crash safety without roll-forward**: a crash before the pointer
  replace leaves unreferenced ``name@g`` directories (garbage, swept by
  the next compaction or ``gc_generations``); a crash after it leaves a
  fully committed index plus sweepable old dirs. There is no window in
  which the index is partially swapped, so the previous
  marker + idempotent-rename machinery is gone entirely.
- **Pinned-snapshot reads**: with ``compact_index(keep_generations=2)``
  (the default) the previous generation's files survive the commit, so
  readers opened before a compaction keep working — and keep returning
  their exact pre-compaction results — until ``gc_generations`` (or the
  next compaction) reclaims the space. ``keep_generations=1`` reclaims
  immediately (single-reader deployments).

Layout compatibility: an index with no ``GENERATION`` file resolves
every logical name to the flat directory (``<index_dir>/postings``) —
the layout ``build_index`` writes. Fresh builds stay flat ("generation
0"); the first compaction introduces the pointer. Append-type writers
(``append_segment``, streaming, deletes) mutate the CURRENT generation
in place, which is safe because their writes are purely additive (new
part-files / new tombstone files never invalidate files a concurrent
reader already listed).

At 10^12 turns the pointer is still one tiny JSON: commit cost is O(1)
regardless of corpus size, and old-generation retention is bounded by
``keep_generations`` (the Iceberg snapshot-expiry analog).
"""

from __future__ import annotations

import json
import os
import re
import shutil

POINTER = "GENERATION"

# every logical name a generation pointer may remap. corpus_stats.json is
# a file, the rest are directories; "tombstones" may legitimately not
# exist (no deletes pending in that generation).
LOGICAL_TABLES = (
    "postings",
    "term_stats",
    "lineage",
    "docs",
    "doc_stats",
    "corpus_stats.json",
    "tombstones",
)

_PHYS_RE = re.compile(
    r"^(" + "|".join(re.escape(t) for t in LOGICAL_TABLES) + r")@(\d+)$")


def _pointer_path(index_dir: str, gen: int | None = None) -> str:
    name = POINTER if gen is None else f"{POINTER}@{gen}"
    return os.path.join(index_dir, name)


def read_generation(index_dir: str, gen: int | None = None) -> dict | None:
    """The pointer dict ``{"gen": int, "tables": {logical: physical}}``,
    or None for a flat (generation-0) index. ``gen`` selects a retained
    historical pointer (``GENERATION@g``)."""
    p = _pointer_path(index_dir, gen)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def current_gen(index_dir: str) -> int:
    g = read_generation(index_dir)
    return int(g["gen"]) if g else 0


def flat_mapping() -> dict[str, str]:
    return {t: t for t in LOGICAL_TABLES}


def table_mapping(index_dir: str) -> dict[str, str]:
    """Logical -> physical relative names for the CURRENT generation
    (flat names when no pointer exists). One pointer read; callers that
    need snapshot consistency across several tables must call this once
    and reuse the dict."""
    g = read_generation(index_dir)
    m = flat_mapping()
    if g:
        m.update(g.get("tables", {}))
    return m


def resolve(index_dir: str, name: str,
            mapping: dict[str, str] | None = None) -> str:
    """Physical path of logical table ``name``. Pass a ``mapping`` from
    :func:`table_mapping` to pin several resolutions to one snapshot."""
    if mapping is None:
        mapping = table_mapping(index_dir)
    return os.path.join(index_dir, mapping.get(name, name))


def physical_name(name: str, gen: int) -> str:
    return f"{name}@{gen}"


def commit_generation(index_dir: str, gen: int,
                      tables: dict[str, str]) -> None:
    """Atomically publish generation ``gen``. Writes the immutable
    history copy first (needed by gc to know what older generations
    reference), then ``os.replace``s the live pointer — the single
    commit point."""
    doc = {"gen": int(gen), "tables": dict(tables)}
    hist = _pointer_path(index_dir, gen)
    tmp = hist + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, hist)
    tmp2 = _pointer_path(index_dir) + ".tmp"
    with open(tmp2, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp2, _pointer_path(index_dir))


def _remove(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.remove(path)


def discard_uncommitted(index_dir: str) -> list[str]:
    """Sweep stage leftovers from a compaction that crashed BEFORE its
    pointer commit: any ``name@g`` with g beyond the current generation,
    plus legacy ``*_compacting`` / ``*_precompact`` dirs. Never touches
    committed generations."""
    cur = current_gen(index_dir)
    removed = []
    for entry in os.listdir(index_dir):
        m = _PHYS_RE.match(entry)
        if m and int(m.group(2)) > cur:
            _remove(os.path.join(index_dir, entry))
            removed.append(entry)
        elif entry.endswith(("_compacting", "_precompact")):
            _remove(os.path.join(index_dir, entry))
            removed.append(entry)
    return removed


def gc_generations(index_dir: str, keep: int = 1) -> list[str]:
    """Reclaim physical dirs no generation in the retention window
    references (Iceberg ``expireSnapshots`` analog). ``keep=1`` keeps
    only the current generation; ``keep=2`` additionally keeps whatever
    the previous generation referenced, so readers opened before the
    last commit stay valid. Returns the removed entries."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur = current_gen(index_dir)
    kept_gens = [g for g in range(cur - keep + 1, cur + 1) if g >= 0]
    live: set[str] = set()
    for g in kept_gens:
        if g == 0:
            live.update(flat_mapping().values())
            continue
        ptr = read_generation(index_dir, g)
        m = flat_mapping()
        if ptr:
            m.update(ptr.get("tables", {}))
        live.update(m.values())
    removed = []
    for entry in os.listdir(index_dir):
        m2 = _PHYS_RE.match(entry)
        is_phys = m2 is not None or entry in LOGICAL_TABLES
        if is_phys and entry not in live:
            _remove(os.path.join(index_dir, entry))
            removed.append(entry)
            continue
        # stale history pointers outside the retention window
        if entry.startswith(POINTER + "@"):
            try:
                g = int(entry.split("@", 1)[1])
            except ValueError:
                continue
            if g not in kept_gens:
                _remove(os.path.join(index_dir, entry))
                removed.append(entry)
    return removed


def reset_generations(index_dir: str) -> None:
    """Drop every pointer and versioned dir (fresh ``build_index`` over
    a previously compacted directory starts back at flat gen 0)."""
    if not os.path.isdir(index_dir):
        return
    for entry in os.listdir(index_dir):
        if entry == POINTER or entry.startswith(POINTER + "@"):
            _remove(os.path.join(index_dir, entry))
        elif _PHYS_RE.match(entry):
            _remove(os.path.join(index_dir, entry))


# ---------------------------------------------------------------------------
# Snapshot / restore (ES _snapshot repository analog)
# ---------------------------------------------------------------------------

def _copytree_linked(src: str, dst: str) -> None:
    """Copy a table dir hardlinking file content where the filesystem
    allows (parquet files are immutable once written, so links are
    safe); falls back to byte copies across devices. The 100 TB
    deployment swaps this for distcp/reflink — the LAYOUT (one flat
    consistent generation + metadata) is the portable part."""
    import shutil

    def _link_or_copy(a, b):
        try:
            os.link(a, b)
        except OSError:
            shutil.copy2(a, b)

    shutil.copytree(src, dst, copy_function=_link_or_copy)


def _copytree_linked_fenced(src: str, dst: str, logical: str,
                            snapshots, next_doc_id) -> None:
    """_copytree_linked restricted to committed part-files (see
    _file_in_fence); directory structure (bucket=N partitions) and
    non-parquet markers copy through unchanged."""
    import shutil

    def _link_or_copy(a, b):
        try:
            os.link(a, b)
        except OSError:
            shutil.copy2(a, b)

    shutil.copytree(
        src, dst, copy_function=_link_or_copy,
        ignore=lambda d, names: [
            n for n in names
            if n.endswith(".parquet")
            and not _file_in_fence(os.path.join(d, n), logical,
                                   snapshots, next_doc_id)])


def _file_in_fence(fp: str, logical: str, snapshots, next_doc_id) -> bool:
    """True when a parquet part-file belongs to the committed-segment
    fence (its footer column stats identify the segment: an appended
    file holds exactly one snapshot_id, and only doc_ids >= the
    pre-append high-water mark). Fails OPEN (keeps the file) on missing
    or unreadable stats — the fence is an exclusion of known-uncommitted
    files, never a reason to drop data."""
    if not fp.endswith(".parquet"):
        return True
    col = ("doc_id" if logical in ("docs", "doc_stats")
           else "snapshot_id")
    if col == "doc_id" and next_doc_id is None:
        return True
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.num_columns)}.get(col)
        if idx is None:
            return True
        mins = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return True
            mins.append(st.min)
        if not mins:
            return True
        if col == "doc_id":
            return int(min(mins)) < int(next_doc_id)
        return any(str(m) in snapshots for m in mins)
    except Exception:
        return True


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Materialize the CURRENT generation as a self-contained flat
    snapshot under ``repo_dir/name`` (ES ``PUT _snapshot/.../<name>``
    analog). Reads the pointer once, so the snapshot is one consistent
    generation even if a compaction commits mid-copy (its files are
    retained by keep_generations while we link them). The snapshot is
    itself a valid flat index dir: IndexReader opens it directly.

    Append consistency (ADVICE r4 torn snapshot): corpus_stats.json is
    read FIRST and its committed-segment fence (snapshots list +
    next_doc_id) filters the copied part-files, so a snapshot taken
    while an append is mid-flight captures exactly the last committed
    state — stats and data files agree, fsck stays green. Indexes
    predating the fence copy whole directories (old behavior: quiesce
    appends around snapshot_index)."""
    snap = os.path.join(repo_dir, name)
    if os.path.exists(snap):
        raise FileExistsError(f"snapshot {name!r} already exists")
    mapping = table_mapping(index_dir)
    gen = current_gen(index_dir)
    # pin the committed state before listing any data file: the stats
    # PARSED here are what the snapshot ships, so fence and stats can
    # never disagree even if an append commits mid-copy
    with open(os.path.join(index_dir, mapping["corpus_stats.json"])) as f:
        pinned_stats = json.load(f)
    fence_snaps = pinned_stats.get("snapshots")
    fence_snaps = set(map(str, fence_snaps)) if fence_snaps else None
    fence_next = pinned_stats.get("next_doc_id")
    os.makedirs(snap + ".tmp")
    copied = []
    for logical, physical in mapping.items():
        src = os.path.join(index_dir, physical)
        if not os.path.exists(src):
            continue  # e.g. no tombstones in this generation
        dst = os.path.join(snap + ".tmp", logical)
        if logical == "corpus_stats.json":
            with open(dst, "w") as f:
                json.dump(pinned_stats, f)
        elif os.path.isdir(src):
            fenced = (fence_snaps is not None and logical in (
                "postings", "term_stats", "lineage", "docs", "doc_stats"))
            if fenced:
                _copytree_linked_fenced(src, dst, logical, fence_snaps,
                                        fence_next)
            else:
                _copytree_linked(src, dst)
        else:
            import shutil

            shutil.copy2(src, dst)
        copied.append(logical)
    # build + streaming bookkeeping rides along so the snapshot is fully
    # standalone: manifest.json (bucket-resume checkpoint) and the
    # streaming exactly-once markers — without stream_batches.json a
    # restored index would treat already-applied replayed micro-batches
    # as unseen and double-append them
    for extra in ("manifest.json", "stream_batches.json",
                  "stream_pending.json", "bpe_merges.json"):
        src = os.path.join(index_dir, extra)
        if os.path.exists(src):
            import shutil

            shutil.copy2(src, os.path.join(snap + ".tmp", extra))
    meta = {"name": name, "source": os.path.abspath(index_dir),
            "source_generation": gen, "tables": copied}
    with open(os.path.join(snap + ".tmp", "SNAPSHOT.json"), "w") as f:
        json.dump(meta, f)
    os.rename(snap + ".tmp", snap)  # atomic publish of the snapshot
    return meta


def restore_index(repo_dir: str, name: str, target_dir: str) -> dict:
    """Restore a snapshot into ``target_dir`` as a fresh flat
    generation-0 index (ES ``_restore`` analog). Refuses a non-empty
    target."""
    snap = os.path.join(repo_dir, name)
    with open(os.path.join(snap, "SNAPSHOT.json")) as f:
        meta = json.load(f)
    if os.path.exists(target_dir) and os.listdir(target_dir):
        raise FileExistsError(f"restore target {target_dir} not empty")
    os.makedirs(target_dir, exist_ok=True)
    for entry in os.listdir(snap):
        if entry == "SNAPSHOT.json":
            continue
        src = os.path.join(snap, entry)
        dst = os.path.join(target_dir, entry)
        if os.path.isdir(src):
            _copytree_linked(src, dst)
        else:
            import shutil

            shutil.copy2(src, dst)
    return meta

"""Index lifecycle over the routed parquet layout (reference ISM
parity): retention deletion and size-based rollover.

The reference delegates lifecycle to OpenSearch Index State
Management — a ``rollover100gb`` policy for ``index_rotation=auto``
indices (deploy_es/data.ini:67-76) plus per-index rollover aliases
(data.ini:1925-…), with age-based delete states user-configured.  In
this engine an "index" is a partition directory
(``index=<family>-<period>``) of routed parquet (pipelines/etl.py
route_index), so lifecycle is driver-side directory metadata work —
deliberately NOT a distributed stage: at 100 TB the file *moves* stay
O(#partitions) renames on the object store, never data reads.
"""

from __future__ import annotations

import os
import re
import shutil

_PART_RX = re.compile(r"^index=(?P<name>.+)$")
# rotation suffixes produced by etl.route_index: -YYYY-MM-DD | -YYYY-wWW
# | -YYYY-MM | -YYYY (checked longest-first so monthly doesn't eat daily)
_PERIOD_RX = re.compile(
    r"^(?P<family>.+)-(?P<period>\d{4}-\d{2}-\d{2}|\d{4}-w\d{2}|"
    r"\d{4}-\d{2}|\d{4})(?P<roll>-r\d{4})?$")


def list_partitions(out_dir: str) -> dict[str, list[dict]]:
    """family -> [{period, roll, path, bytes}] sorted by (period,
    roll).  Period strings sort chronologically within one rotation
    scheme (zero-padded calendar forms)."""
    out: dict[str, list[dict]] = {}
    if not os.path.isdir(out_dir):
        return out
    for d in sorted(os.listdir(out_dir)):
        m = _PART_RX.match(d)
        if not m or not os.path.isdir(os.path.join(out_dir, d)):
            continue
        pm = _PERIOD_RX.match(m.group("name"))
        if not pm:
            continue
        path = os.path.join(out_dir, d)
        nbytes = sum(os.path.getsize(os.path.join(path, f))
                     for f in os.listdir(path)
                     if os.path.isfile(os.path.join(path, f)))
        out.setdefault(pm.group("family"), []).append({
            "period": pm.group("period"),
            "roll": pm.group("roll") or "",
            "path": path, "bytes": nbytes,
        })
    for parts in out.values():
        parts.sort(key=lambda p: (p["period"], p["roll"]))
    return out


def apply_retention(out_dir: str, keep_periods: int,
                    family: str | None = None,
                    dry_run: bool = False) -> dict:
    """Delete every partition older than the newest ``keep_periods``
    distinct periods of its family (the ISM delete state: the
    reference rotates monthly and lets ISM expire old indices).
    Returns {family: {"kept": [...], "deleted": [...]}} of period
    strings; ``dry_run`` reports without deleting."""
    if keep_periods < 1:
        raise ValueError("keep_periods must be >= 1")
    report: dict[str, dict] = {}
    for fam, parts in list_partitions(out_dir).items():
        if family is not None and fam != family:
            continue
        periods = sorted({p["period"] for p in parts})
        keep = set(periods[-keep_periods:])
        rep = {"kept": sorted(keep), "deleted": []}
        for p in parts:
            if p["period"] in keep:
                continue
            rep["deleted"].append(p["period"] + p["roll"])
            if not dry_run:
                shutil.rmtree(p["path"])
        report[fam] = rep
    return report


def rollover_partitions(out_dir: str, max_bytes: int,
                        dry_run: bool = False) -> dict:
    """Size-based rollover (the reference's ``rollover100gb`` ISM
    policy for ``index_rotation=auto``): a partition directory whose
    parquet exceeds ``max_bytes`` is split — files assigned to
    consecutive bins by cumulative size; the first bin keeps the
    directory, later bins become ``<name>-r0002``… sibling partitions
    (OpenSearch's ``log-x-000002`` rollover naming, partition-encoded).
    File RENAMES only — no data is read or rewritten, so the pass is
    O(#files) metadata work at any corpus size.  Directories already
    produced by a rollover (-rNNNN) are left alone (idempotent)."""
    report: dict[str, list[str]] = {}
    for fam, parts in list_partitions(out_dir).items():
        for p in parts:
            if p["roll"] or p["bytes"] <= max_bytes:
                continue
            files = sorted(f for f in os.listdir(p["path"])
                           if os.path.isfile(os.path.join(p["path"], f)))
            bins: list[list[str]] = [[]]
            acc = 0
            for f in files:
                sz = os.path.getsize(os.path.join(p["path"], f))
                if acc + sz > max_bytes and bins[-1]:
                    bins.append([])
                    acc = 0
                bins[-1].append(f)
                acc += sz
            if len(bins) < 2:
                continue
            made = []
            base = os.path.basename(p["path"])       # index=<name>
            for i, group in enumerate(bins[1:], start=2):
                new_dir = os.path.join(out_dir, f"{base}-r{i:04d}")
                made.append(os.path.basename(new_dir))
                if dry_run:
                    continue
                os.makedirs(new_dir, exist_ok=True)
                for f in group:
                    os.replace(os.path.join(p["path"], f),
                               os.path.join(new_dir, f))
            report.setdefault(fam, []).extend(made)
    return report


# ---------------------------------------------------------------------------
# _snapshot (create / restore / status) — OpenSearch snapshot-repository
# parity over inverted-index directories.  The reference registers an
# S3 snapshot repository and relies on OpenSearch snapshots for backup
# (deploy_es advanced setup); here a snapshot is a verified copy of the
# index directory into a repository directory.  Driver-side file I/O by
# design — at 100 TB you would fan the per-file copies out as Ray tasks
# against the object store, but the CONTROL flow (census, manifest,
# verify) stays exactly this.


def _file_census(root: str) -> dict[str, int]:
    """{relative_path: size} over every regular file under root."""
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out[os.path.relpath(p, root)] = os.path.getsize(p)
    return out


def snapshot_create(index_dir: str, repo_dir: str, name: str) -> dict:
    """``PUT _snapshot/<repo>/<name>``: copy the index (postings,
    docstore, filters, manifests, tombstones, pits — the whole
    queryable state) into the repository under ``name`` with a
    SNAPSHOT.json recording the file census and the index fingerprint.
    An existing snapshot name refuses (OpenSearch 400s on collision)."""
    import json
    dest = os.path.join(repo_dir, name)
    if os.path.exists(dest):
        raise ValueError(f"snapshot {name!r} already exists in the "
                         "repository")
    with open(os.path.join(index_dir, "INDEX_MANIFEST.json")) as f:
        man = json.load(f)
    os.makedirs(repo_dir, exist_ok=True)
    shutil.copytree(index_dir, dest)
    census = _file_census(dest)
    meta = {"snapshot": name, "state": "SUCCESS",
            "fingerprint": man["fingerprint"],
            "n_docs": int(man["stats"]["n_docs"]),
            "n_files": len(census),
            "total_bytes": int(sum(census.values())),
            "files": census}
    with open(os.path.join(repo_dir, f"{name}.SNAPSHOT.json"),
              "w") as f:
        json.dump(meta, f)
    return {k: v for k, v in meta.items() if k != "files"}


def snapshot_restore(repo_dir: str, name: str, dest_dir: str) -> dict:
    """``POST _snapshot/<repo>/<name>/_restore``: copy the snapshot to
    ``dest_dir`` (which must not exist — restoring over a live index
    refuses, the OpenSearch open-index rule) and VERIFY the restored
    file census byte-for-byte against the snapshot manifest before
    reporting success."""
    import json
    src = os.path.join(repo_dir, name)
    meta_path = os.path.join(repo_dir, f"{name}.SNAPSHOT.json")
    if not os.path.isdir(src) or not os.path.exists(meta_path):
        raise KeyError(f"unknown snapshot {name!r}")
    if os.path.exists(dest_dir):
        raise ValueError("restore destination exists — close/remove "
                         "the live index first")
    with open(meta_path) as f:
        meta = json.load(f)
    shutil.copytree(src, dest_dir)
    got = _file_census(dest_dir)
    if got != meta["files"]:
        raise RuntimeError(
            f"restore verification failed: {len(got)} files vs "
            f"{meta['n_files']} in the snapshot manifest")
    return {"snapshot": name, "state": "RESTORED",
            "n_files": len(got),
            "total_bytes": int(sum(got.values()))}


def snapshot_status(repo_dir: str) -> list[dict]:
    """``GET _snapshot/<repo>/_all``: every snapshot's summary row."""
    import json
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for fn in sorted(os.listdir(repo_dir)):
        if fn.endswith(".SNAPSHOT.json"):
            with open(os.path.join(repo_dir, fn)) as f:
                meta = json.load(f)
            out.append({k: meta[k] for k in
                        ("snapshot", "state", "fingerprint", "n_docs",
                         "n_files", "total_bytes")})
    return out


def clone_index(index_dir: str, dest_dir: str) -> dict:
    """OpenSearch ``_clone``: copy an index to a new name (same
    config, same docs — the cheap pre-reshard/retention-fork step).
    A direct verified copy (byte census compared after the copy, the
    snapshot machinery without a repository); the destination must
    not exist.  The clone answers queries identically — the layout IS
    the index."""
    if os.path.exists(dest_dir):
        raise ValueError("clone destination exists")
    if not os.path.isfile(os.path.join(index_dir,
                                       "INDEX_MANIFEST.json")):
        raise KeyError(f"{index_dir!r} is not an index")
    shutil.copytree(index_dir, dest_dir)
    want = _file_census(index_dir)
    got = _file_census(dest_dir)
    if got != want:
        raise RuntimeError("clone verification failed: file census "
                           "mismatch after copy")
    return {"acknowledged": True, "n_files": len(got),
            "total_bytes": int(sum(got.values()))}

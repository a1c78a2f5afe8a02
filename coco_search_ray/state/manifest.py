"""Per-partition lineage manifests — the checkpoint/resume substrate.

Reference semantics being re-expressed: the tracking table upserted with
(filename, content_hash) after EACH file commit (indexer/flow.py:436-445),
diffed on re-run to skip unchanged inputs (flow.py:345-369). Our batch
equivalent: one manifest JSON per completed input shard, written AFTER the
shard's Parquet output lands, with a write-temp-then-rename protocol so a
shard is atomically "written+manifested" or not at all (SURVEY.md §7.5.4).

Resume = list manifests, anti-join against the input shard list on
(shard_id, input_hash): only missing/changed shards are reprocessed.
At 100 TB the input_hash would come from object-store etags; here it is a
SHA-256 over file size + first/last 64 KiB (cheap, content-sensitive).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def input_fingerprint(path: str) -> str:
    """Cheap content fingerprint: size + head/tail 64 KiB + three 4 KiB
    interior samples at size/4, size/2 and 3*size/4 for files above
    128 KiB (a same-size rewrite confined to unsampled interior bytes is
    still invisible — this is a sampling fingerprint, not a full hash;
    at 100 TB the equivalent would be object-store etags)."""
    size = os.path.getsize(path)
    h = hashlib.sha256(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
        if size > 65536:
            # always cover the tail: seek to max(head_end, size - 64 KiB)
            # so files in (64 KiB, 128 KiB] hash their remaining bytes too
            # (overlap with the head read is fine; a gap is not)
            f.seek(max(65536, size - 65536))
            h.update(f.read(65536))
        if size > 131072:
            for frac in (4, 2):
                f.seek(size // frac)
                h.update(f.read(4096))
            f.seek(3 * (size // 4))
            h.update(f.read(4096))
    return h.hexdigest()


def _manifest_path(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{shard_id}.json")


def read_manifest(out_dir: str, shard_id: str) -> dict | None:
    p = _manifest_path(out_dir, shard_id)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def shard_is_done(
    out_dir: str,
    shard_id: str,
    input_hash: str,
    globals_hash: str | None = None,
    extract_hash: str | None = None,
) -> bool:
    """A shard is reusable only if its input fingerprint, the run-global
    fingerprint (catalog + canonicalization/link params) AND the
    extraction fingerprint (family plan + stream schema) all match, and
    its data directory actually exists. The reference re-resolves ALL
    edges when inputs change because new inputs can resolve
    previously-external targets (deps/extractor.py:387-395); our analog:
    a changed catalog changes the linkmap for EVERY shard. The
    extract_hash check makes ADDING AN EXTRACTOR FAMILY invalidate
    committed shards (they lack the new family's triples); the
    existence check covers the commit crash window where the old data
    dir was renamed aside but the new one not yet promoted."""
    m = read_manifest(out_dir, shard_id)
    if not (m and m.get("status") == "done" and m.get("input_hash") == input_hash):
        return False
    if globals_hash is not None and m.get("globals_hash") != globals_hash:
        return False
    if extract_hash is not None and m.get("extract_hash") != extract_hash:
        return False
    return os.path.isdir(shard_output_dir(out_dir, shard_id))


def shard_output_dir(out_dir: str, shard_id: str) -> str:
    return os.path.join(out_dir, f"shard={shard_id}")


def commit_shard(
    out_dir: str,
    shard_id: str,
    input_hash: str,
    tmp_dir: str,
    stats: dict,
) -> None:
    """Atomically promote a shard: rename tmp output dir into place, then
    write the manifest (manifest-last ordering = manifest implies data).
    An existing committed dir is renamed ASIDE (not rmtree'd) before the
    promote — a crash between a delete and the promote would leave a
    done-manifest with no data (silent row loss on read); with the
    rename-aside, the crash window leaves no final dir and shard_is_done
    rebuilds. The aside name does NOT start with 'shard=' so readers
    never pick it up; it is removed after the manifest lands."""
    final = shard_output_dir(out_dir, shard_id)
    aside = os.path.join(out_dir, f"_old_shard_{shard_id}")
    if os.path.exists(final):
        shutil.rmtree(aside, ignore_errors=True)
        os.replace(final, aside)
    os.replace(tmp_dir, final)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    manifest = {
        "shard": shard_id,
        "input_hash": input_hash,
        "status": "done",
        "committed_at": time.time(),
        **stats,
    }
    mp = _manifest_path(out_dir, shard_id)
    tmp_mp = mp + ".tmp"
    with open(tmp_mp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_mp, mp)
    shutil.rmtree(aside, ignore_errors=True)


def pending_shards(
    out_dir: str, shards: list[tuple[str, str]], globals_hash: str | None = None
) -> list[tuple[str, str]]:
    """Anti-join: shards (shard_id, input_path) without a matching done
    manifest (input fingerprint AND run-global fingerprint)."""
    out = []
    for shard_id, path in shards:
        if not shard_is_done(out_dir, shard_id, input_fingerprint(path), globals_hash):
            out.append((shard_id, path))
    return out


def list_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out

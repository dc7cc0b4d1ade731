"""Master/replica index replication over commit points.

Solr's pull replication (ReplicationHandler + IndexFetcher) rendered
on the hardlink commit-point forest:

* the master publishes a commit point's generation and file listing —
  ``ReplicationHandler.java:251-278`` (``CMD_INDEX_VERSION`` returns
  the commit's generation, ``CMD_GET_FILE_LIST`` the per-file
  name/size/checksum list, built at ``:371-375``);
* the replica polls, compares generations, and fetches ONLY files it
  does not already hold bit-identically — ``IndexFetcher.java:346-359``
  (``fetchLatestIndex``), ``:1014`` / ``:1051-1056`` (``compareFile``
  on length + checksum), ``:1019-1026`` (differential copy: an equal
  local file is hard-linked into the staging dir instead of fetched,
  counted in ``bytesSkippedCopying``);
* the install is staged in a temp dir and atomically swapped in, so a
  crashed fetch never corrupts the serving index (the reference stages
  to ``index.tmp-...`` and fsyncs via ``fsyncService``,
  ``IndexFetcher.java:491,769-774``; here the write-once parquet
  layout plus a single ``os.rename`` gives the same guarantee).

Why this works unchanged at cluster scale: every file in a commit
point is write-once (mutations replace *names*, never contents — see
``create_snapshot``), so "same relpath + same size + same CRC32" is a
sufficient identity test, exactly the property Lucene's write-once
segment files give IndexFetcher. Checksums are CRC32 to mirror the
codec-footer checksum Lucene compares (``CodecUtil.writeFooter``;
``compareFile`` reads it via ``CodecUtil.retrieveChecksum``). In
production the master/replica transport is an object store (the
listing maps 1:1 onto GET/PUT of immutable objects); the local-FS
copy here is the sandbox rendering of that seam.

The replica root produced by :func:`fetch_index` is itself a complete
index root: open it with ``SegmentIndex(replica_root, spark)`` and
serve queries from it — Solr's master-indexes/replicas-serve topology.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

__all__ = [
    "publish_file_list",
    "fetch_index",
    "replication_details",
]

_STATE_FILE = "replication.json"
_CHUNK = 1 << 20


def _crc32(path: str) -> int:
    crc = 0
    with open(path, "rb") as f:
        while True:
            b = f.read(_CHUNK)
            if not b:
                return crc
            crc = zlib.crc32(b, crc)


def _latest_gen(master_root: str) -> int | None:
    from .segments import list_snapshots

    snaps = list_snapshots(master_root)
    return snaps[-1]["gen"] if snaps else None


def publish_file_list(master_root: str, gen: int | None = None) -> dict:
    """Master side of ``CMD_GET_FILE_LIST`` (+ ``CMD_INDEX_VERSION``):
    the file listing of commit point ``gen`` (default: latest), each
    entry ``{name, size, checksum}`` with ``name`` relative to the
    commit root. ``ReplicationHandler.java:251-278,371-375``."""
    if gen is None:
        gen = _latest_gen(master_root)
        if gen is None:
            raise FileNotFoundError(
                f"no commit point under {master_root}; create_snapshot() "
                "first (replication always ships a pinned commit, never "
                "the moving live tree)")
    commit = os.path.join(master_root, "commits", f"gen-{gen}")
    if not os.path.exists(os.path.join(commit, "snapshot.json")):
        raise FileNotFoundError(f"no commit point gen-{gen} under {master_root}")
    files = []
    for dirpath, _dirs, names in os.walk(commit):
        for fn in sorted(names):
            p = os.path.join(dirpath, fn)
            files.append({
                "name": os.path.relpath(p, commit),
                "size": os.path.getsize(p),
                "checksum": _crc32(p),
            })
    files.sort(key=lambda f: f["name"])
    return {"generation": gen, "commit_dir": commit, "files": files}


def _replica_state(replica_root: str) -> dict:
    p = os.path.join(replica_root, _STATE_FILE)
    if not os.path.exists(p):
        return {"generation": 0, "files": {}}
    with open(p) as f:
        return json.load(f)


def fetch_index(master_root: str, replica_root: str,
                gen: int | None = None, force: bool = False) -> dict:
    """Replica side (``IndexFetcher.fetchLatestIndex``,
    ``IndexFetcher.java:346-359``): pull commit point ``gen`` (default
    latest) from ``master_root`` into ``replica_root``.

    Returns a result dict with ``status`` one of:

    * ``"already_in_sync"`` — replica generation == master generation
      and not ``force`` (``IndexFetchResult.ALREADY_IN_SYNC``,
      ``IndexFetcher.java:183``); nothing touched.
    * ``"success"`` — new index installed; ``files_fetched`` /
      ``bytes_downloaded`` count real copies, ``files_skipped`` /
      ``bytes_skipped`` count files reused from the previous replica
      tree via hardlink (differential copy,
      ``IndexFetcher.java:1019-1026``).

    Crash safety: the new tree is fully staged beside the live one and
    installed with one ``os.rename`` swap; a stale staging dir from a
    killed fetch is discarded on the next call."""
    listing = publish_file_list(master_root, gen)
    target_gen = listing["generation"]
    state = _replica_state(replica_root)
    if state["generation"] == target_gen and not force:
        return {"status": "already_in_sync", "generation": target_gen,
                "files_fetched": 0, "bytes_downloaded": 0,
                "files_skipped": 0, "bytes_skipped": 0}

    commit = listing["commit_dir"]
    tmp = replica_root + f".fetch-tmp-gen{target_gen}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale staging dir from a killed fetch
    os.makedirs(tmp)

    prior = state["files"]  # name -> [size, checksum] of installed tree
    fetched = skipped = bytes_dl = bytes_skip = 0
    for f in listing["files"]:
        name, size, checksum = f["name"], f["size"], f["checksum"]
        dst = os.path.join(tmp, name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        local = os.path.join(replica_root, name)
        have = prior.get(name)
        # compareFile: equal length AND equal checksum → reuse local
        # copy (IndexFetcher.java:1014,1051-1056,1019-1026)
        if (not force and have is not None and have[0] == size
                and have[1] == checksum and os.path.exists(local)):
            os.link(local, dst)
            skipped += 1
            bytes_skip += size
        else:
            shutil.copyfile(os.path.join(commit, name), dst)
            fetched += 1
            bytes_dl += size
    new_state = {
        "generation": target_gen,
        "ts": time.time(),
        "master_root": os.path.abspath(master_root),
        "files": {f["name"]: [f["size"], f["checksum"]]
                  for f in listing["files"]},
    }
    with open(os.path.join(tmp, _STATE_FILE), "w") as fh:
        json.dump(new_state, fh)

    # atomic install: swap the staged tree in, drop the old one
    old = replica_root + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(replica_root):
        os.rename(replica_root, old)
    os.rename(tmp, replica_root)
    if os.path.exists(old):
        shutil.rmtree(old)
    return {"status": "success", "generation": target_gen,
            "files_fetched": fetched, "bytes_downloaded": bytes_dl,
            "files_skipped": skipped, "bytes_skipped": bytes_skip}


def replication_details(master_root: str | None = None,
                        replica_root: str | None = None) -> dict:
    """``ReplicationHandler`` ``CMD_DETAILS`` role: master commit
    points and/or replica sync state, for monitoring."""
    out: dict = {}
    if master_root is not None:
        from .segments import list_snapshots

        out["master"] = {
            "commits": list_snapshots(master_root),
            "replicable_generation": _latest_gen(master_root),
        }
    if replica_root is not None:
        st = _replica_state(replica_root)
        out["replica"] = {"generation": st["generation"],
                          "master_root": st.get("master_root"),
                          "file_count": len(st["files"])}
    return out

"""Data staging: copy the files an scp references to fast local storage.

The reference rsyncs feature files from NFS to node-local disk before
training (tools/copy_scp_data_to_dir.sh, invoked from archs/uPIT.py:56-58)
and rewrites paths to the staged location. On a single TPU host with local
storage this is usually unnecessary — the input pipeline streams — but the
capability is kept for slow network filesystems: files land under the
target dir mirroring their absolute paths (the reference's rsync
``--files-from=... /`` behavior), so the staged path is simply
``<target>/<original-absolute-path>``.

``bwlimit`` (bytes/sec, None = unlimited) matches the reference's knob.
"""

from __future__ import annotations

import os
import shutil
import time

from .scp import read_scp


def stage_scp_data(scp_path: str, target_dir: str,
                   bwlimit_kbps: float | None = None,
                   log=print) -> dict[str, str]:
    """Copy every file in the scp's value column into target_dir.

    Returns {original_path: staged_path}. Files already staged with matching
    size are skipped (cheap idempotent re-runs, like rsync).
    """
    mapping: dict[str, str] = {}
    copied = 0
    budget_start = time.time()
    bytes_copied = 0
    for _, src in read_scp(scp_path):
        dst = os.path.join(target_dir, src.lstrip("/"))
        mapping[src] = dst
        if (os.path.isfile(dst)
                and os.path.getsize(dst) == os.path.getsize(src)):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        copied += 1
        bytes_copied += os.path.getsize(src)
        if bwlimit_kbps:
            # simple token-bucket pacing to match rsync --bwlimit semantics
            min_elapsed = bytes_copied / (bwlimit_kbps * 1024.0)
            sleep = min_elapsed - (time.time() - budget_start)
            if sleep > 0:
                time.sleep(sleep)
    log(f"staged {copied} files ({bytes_copied >> 20} MiB) -> {target_dir}")
    return mapping


def staged_path(original: str, target_dir: str) -> str:
    return os.path.join(target_dir, original.lstrip("/"))

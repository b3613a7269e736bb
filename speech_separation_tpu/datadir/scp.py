"""Kaldi-style scp / data-dir file primitives.

The data-dir contract (reference layer L1, SURVEY.md):
a directory ``data/<set>/`` containing

- ``wav.scp``          lines of ``<utt-id> <path-to-mix-wav>``
- ``segments``         optional: ``<seg-id> <reco-id> <t-start> <t-end>``
- ``feats_train.scp`` / ``feats_test.scp``  ``<utt-id> <path-to-npz>``
- ``utt2num_spk``      ``<utt-id> <num-speakers>``

All files are whitespace-separated, one record per line, and every consumer
in the pipeline addresses data through them. This module is pure Python with
no JAX dependency so the toolkit stays importable anywhere.
"""

from __future__ import annotations

import os


def read_scp(path: str) -> list[tuple[str, str]]:
    """Read an scp file as an ordered list of (key, value) pairs.

    Order matters: the reference iterates scp files top-to-bottom and the
    split/merge tooling relies on stable ordering.
    """
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            key, _, rest = line.partition(" ")
            out.append((key, rest))
    return out


def write_scp(path: str, entries) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for key, value in entries:
            f.write(f"{key} {value}\n")


def read_utt2num_spk(path: str) -> dict[str, int]:
    """utt2num_spk as a dict (reference steps/evaluate_sources.py:21-26)."""
    return {k: int(v) for k, v in read_scp(path)}


def write_utt2num_spk(path: str, mapping) -> None:
    items = mapping.items() if isinstance(mapping, dict) else mapping
    write_scp(path, ((k, str(v)) for k, v in items))


def read_segments(path: str) -> dict[str, list[tuple[str, float, float]]]:
    """Read a segments file grouped by recording id.

    Returns {reco_id: [(seg_id, t_start, t_end), ...]} preserving file order
    within each recording (reference steps/extract_feats.py:51-58).
    """
    segs: dict[str, list[tuple[str, float, float]]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            seg_id, reco_id, t0, t1 = parts[0], parts[1], float(parts[2]), float(parts[3])
            segs.setdefault(reco_id, []).append((seg_id, t0, t1))
    return segs


def source_wavs_for_mix(mix_path: str) -> list[str]:
    """Find the mixture + source wav files for a mixture path.

    The corpus layout convention (reference steps/extract_feats.py:65):
    ``.../mix/<utt>.wav`` with sibling directories ``s1/ s2/ ...`` holding
    the isolated sources. Globbing ``/mix/`` -> ``/*/`` and sorting yields
    ``[mix, s1, s2, ...]`` because "mix" sorts before "s*".
    """
    import glob
    return sorted(glob.glob(mix_path.replace("/mix/", "/*/")))

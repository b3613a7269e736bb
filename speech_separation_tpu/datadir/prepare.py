"""Data-dir preparation (reference local/prepare_data_dir.sh).

Builds ``data/<set>/wav.scp`` from an utterance-id list plus the dataset
registry. Two modes, matching the reference:

- regular sets: each id in ``id_lists/<set>.txt`` maps to
  ``<wav_root>/mix/<id>.wav`` (reference local/prepare_data_dir.sh:31-36);
- ``combo*`` sets: ids are selected out of the already-prepared constituent
  sets' wav.scp files (reference local/prepare_data_dir.sh:14-30). The
  reference greps with substring match; we match on exact utterance id,
  which is what the id lists actually contain.
"""

from __future__ import annotations

import os

from .registry import DatasetRegistry, COMBO_SOURCE_SETS
from .scp import read_scp, write_scp


def read_id_list(id_lists_dir: str, dataset: str) -> list[str]:
    path = os.path.join(id_lists_dir, dataset + ".txt")
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def prepare_data_dir(dataset: str, registry: DatasetRegistry,
                     data_root: str = "data",
                     id_lists_dir: str = "id_lists") -> str:
    """Create data/<dataset>/wav.scp. Returns the data-dir path."""
    out_dir = os.path.join(data_root, dataset)
    os.makedirs(out_dir, exist_ok=True)
    ids = read_id_list(id_lists_dir, dataset)

    if dataset.startswith("combo"):
        wanted = set(ids)
        entries: list[tuple[str, str]] = []
        for source_set in COMBO_SOURCE_SETS:
            src_scp = os.path.join(data_root, source_set, "wav.scp")
            if not os.path.isfile(src_scp):
                raise FileNotFoundError(
                    f"combo dataset {dataset!r} selects from {COMBO_SOURCE_SETS}; "
                    f"prepare {source_set!r} first (missing {src_scp})")
            entries.extend((k, v) for k, v in read_scp(src_scp) if k in wanted)
    else:
        mix_dir = registry.mix_dir(dataset)
        entries = [(utt, os.path.join(mix_dir, utt + ".wav")) for utt in ids]

    write_scp(os.path.join(out_dir, "wav.scp"), entries)
    return out_dir

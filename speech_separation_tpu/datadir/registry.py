"""Dataset registry: maps dataset names to corpus wav roots.

Replaces the reference's hardcoded ``id_lists/path.sh`` (getID case table +
wav_dirs array, reference id_lists/path.sh:3-43) with a declarative registry
that can be populated from:

1. a JSON file (``id_lists/path.json`` by default) mapping
   ``{"<dataset>": "<corpus-root>"}``, where <corpus-root> is the directory
   that contains the ``mix/ s1/ s2/ ...`` subdirectories;
2. the ``SEPSEP_WAV_DIR_<DATASET>`` environment variables (override wins);
3. programmatic registration.

The reference's combo-set convention is preserved: a dataset whose name
starts with ``combo`` is assembled by grepping utterance ids out of the five
constituent training sets (reference local/prepare_data_dir.sh:14-30).
"""

from __future__ import annotations

import json
import os

# The constituent sets a combo_* dataset draws from
# (reference local/prepare_data_dir.sh:15).
COMBO_SOURCE_SETS = (
    "wsj_tr", "chime5_ct_train", "chime5_U01_train",
    "mixer6_CH02_tr", "mixer6_CH09_tr",
)

# Dataset names known to the reference recipe (id_lists/path.sh:5-24).
KNOWN_DATASETS = (
    "wsj_cv", "wsj_tr", "wsj_tt",
    "chime5_ct_dev", "chime5_ct_train",
    "chime5_U01_dev", "chime5_U01_train",
    "mixer6_CH02_cv", "mixer6_CH02_tr", "mixer6_CH02_tr_100k", "mixer6_CH02_tt",
    "mixer6_CH09_cv", "mixer6_CH09_tr", "mixer6_CH09_tr_100k", "mixer6_CH09_tt",
)


class DatasetRegistry:
    def __init__(self, mapping: dict[str, str] | None = None):
        self._map: dict[str, str] = dict(mapping or {})

    @classmethod
    def load(cls, json_path: str | None = None) -> "DatasetRegistry":
        """Build a registry from the JSON file (if present) plus env vars."""
        mapping: dict[str, str] = {}
        if json_path and os.path.isfile(json_path):
            with open(json_path) as f:
                mapping.update(json.load(f))
        prefix = "SEPSEP_WAV_DIR_"
        for key, value in os.environ.items():
            if key.startswith(prefix):
                mapping[key[len(prefix):].lower()] = value
        return cls(mapping)

    def register(self, dataset: str, wav_root: str) -> None:
        self._map[dataset] = wav_root

    def wav_root(self, dataset: str) -> str:
        try:
            return self._map[dataset]
        except KeyError:
            raise KeyError(
                f"Dataset {dataset!r} is not registered. Add it to the "
                f"registry JSON or set SEPSEP_WAV_DIR_{dataset.upper()}. "
                f"Known reference datasets: {', '.join(KNOWN_DATASETS)}"
            ) from None

    def mix_dir(self, dataset: str) -> str:
        """Directory holding the mixture wavs (…/<root>/mix/)."""
        return os.path.join(self.wav_root(dataset), "mix")

    def __contains__(self, dataset: str) -> bool:
        return dataset in self._map

    def datasets(self) -> list[str]:
        return sorted(self._map)

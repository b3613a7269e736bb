from .scp import read_scp, write_scp, read_utt2num_spk, write_utt2num_spk
from .registry import DatasetRegistry
from .prepare import prepare_data_dir
from .validate import validate_data_dir
from .split import split_data_dir
from .stage import stage_scp_data

__all__ = [
    "read_scp", "write_scp", "read_utt2num_spk", "write_utt2num_spk",
    "DatasetRegistry", "prepare_data_dir", "validate_data_dir",
    "split_data_dir", "stage_scp_data",
]

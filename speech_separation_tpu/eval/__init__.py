from .bss_eval import bss_eval_sources, si_sdr, si_sdr_improvement
from .infer import generate_masks, load_model
from .reconstruct import reconstruct_sources
from .score import evaluate_sources
from .oracle import evaluate_oracle, merge_oracle_shards
from .pipeline import SeparationPipeline

__all__ = ["bss_eval_sources", "si_sdr", "si_sdr_improvement",
           "generate_masks", "load_model", "reconstruct_sources",
           "evaluate_sources", "evaluate_oracle", "merge_oracle_shards",
           "SeparationPipeline"]

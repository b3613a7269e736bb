from .batchnorm import batchnorm_apply, init_batchnorm
from .pit import pairwise_mse, permutation_min_loss, make_permutations

__all__ = ["batchnorm_apply", "init_batchnorm",
           "pairwise_mse", "permutation_min_loss", "make_permutations"]

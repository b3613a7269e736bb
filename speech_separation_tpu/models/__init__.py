from . import upit, rsh
from .blstm import init_blstm_params, blstm_forward, random_hidden
from .registry import get_arch, ARCHS

__all__ = ["upit", "rsh", "init_blstm_params", "blstm_forward",
           "random_hidden", "get_arch", "ARCHS"]

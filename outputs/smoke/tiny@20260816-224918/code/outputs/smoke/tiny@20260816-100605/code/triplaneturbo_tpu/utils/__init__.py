from .config import DotDict, load_config, parse_structured, config_to_primitive, dump_config
from .misc import barrier, cleanup, find_last_path, get_device_count, get_rank, get_world_size, parse_dtype
from .prng import KeySeq, per_process_key
from .schedule import C, C_max

__all__ = [
    "DotDict",
    "load_config",
    "parse_structured",
    "config_to_primitive",
    "dump_config",
    "barrier",
    "cleanup",
    "find_last_path",
    "get_device_count",
    "get_rank",
    "get_world_size",
    "parse_dtype",
    "KeySeq",
    "per_process_key",
    "C",
    "C_max",
]

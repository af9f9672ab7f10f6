from .registry import Registry, build_from_cfg
from .config import Config, CfgDict, merge_dict, parse_option_value
from .logging import get_logger, JsonlLogger
from .misc import ascii_table, get_bounding_box, set_random_seed, Timer
from . import morphology
from .metrics import *  # noqa: F401,F403

__all__ = [
    'Registry', 'build_from_cfg', 'Config', 'CfgDict', 'merge_dict', 'parse_option_value', 'get_logger',
    'JsonlLogger', 'ascii_table', 'get_bounding_box', 'set_random_seed', 'Timer', 'morphology'
]

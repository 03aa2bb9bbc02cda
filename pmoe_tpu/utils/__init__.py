from .config import Config, get_conf, to_dict
from .utility import one_hot, timeit, class_labels, CLASS_NAMES
from .nn import (
    jit_init,
    get_initializer,
    make_freeze_mask,
    trainable_count,
    param_count,
    check_grad_norm,
    global_norm,
    op_counter,
    EarlyStopping,
)
from .io import save_checkpoint, load_checkpoint, graft
from .logger import ExperimentLogger, init_logger

__all__ = [
    "Config", "get_conf", "to_dict",
    "one_hot", "timeit", "class_labels", "CLASS_NAMES",
    "jit_init", "get_initializer", "make_freeze_mask", "trainable_count", "param_count",
    "check_grad_norm", "global_norm", "op_counter", "EarlyStopping",
    "save_checkpoint", "load_checkpoint", "graft",
    "ExperimentLogger", "init_logger",
]

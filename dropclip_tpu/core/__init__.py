from .config import CfgNode, load_cfg, merge_cfg_from_list
from .schedule import cosine_annealing_warm_restarts, poly_learning_rate, step_learning_rate
from . import metrics
from .meters import AverageMeter, ProgressMeter

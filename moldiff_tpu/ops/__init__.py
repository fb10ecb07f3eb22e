from . import graph_ops
from .categorical import CategoricalTransition, index_to_log_onehot, log_sample_categorical
from .gaussian import GaussianTransition
from .schedules import get_beta_schedule

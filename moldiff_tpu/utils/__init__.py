from .config import Config, load_config, loads_config, save_config
from .misc import BlackHole, MetricsWriter, get_logger, get_new_log_dir, seed_all

from visreps_tpu.core.config import Config, load_config, merge_nested_config
from visreps_tpu.core.validate import validate_config, ConfigVerifier
from visreps_tpu.core.db import compute_run_id, save_results, init_db, RESULTS_DB_PATH

__all__ = [
    "Config",
    "load_config",
    "merge_nested_config",
    "validate_config",
    "ConfigVerifier",
    "compute_run_id",
    "save_results",
    "init_db",
    "RESULTS_DB_PATH",
]

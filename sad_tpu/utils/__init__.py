from .stats import TrainingStats, SmoothedValue
from .timer import Timer
from .logging import log_json_stats, setup_logging

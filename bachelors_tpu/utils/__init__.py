from .logging import get_logger, log_grouped, format_bytes
from .timing import BenchStats, benchmark_median, benchmark_steps

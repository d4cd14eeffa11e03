from lfm_tpu.utils.logger import MetricLogger, configure_logger
from lfm_tpu.utils.profiling import Timer, measure_latency, trace

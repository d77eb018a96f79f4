from hdmoe_tpu.obs.logger import Logger
from hdmoe_tpu.obs.profiling import profile_trace, StepTimer

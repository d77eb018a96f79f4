from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule, edm_sample, make_denoiser
from hdmoe_tpu.sampler.dpm import dpmpp_2m_sample, make_sampler, solver_nfe
from hdmoe_tpu.sampler.staggered import StaggeredEngine, make_staggered_round, staggered_offsets

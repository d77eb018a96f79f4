from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule, edm_sample, make_denoiser

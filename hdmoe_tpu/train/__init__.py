from hdmoe_tpu.train.loss import EDMLossConfig, edm_loss, load_balance, z_loss, entropy_loss, path_prior_loss
from hdmoe_tpu.train.sigma import sample_sigma, sample_sigma_hybrid
from hdmoe_tpu.train.schedulers import ZetaSchedule, MaskGenerator, zeta_at_step, bandwidth_at_step

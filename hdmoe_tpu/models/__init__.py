from hdmoe_tpu.models.configs import HDMOEMConfig, default_model_config
from hdmoe_tpu.models.hdmoem import (
    hdmoem_init,
    hdmoem_apply,
    precond_init,
    precond_apply,
)

"""hdmoe_tpu — TPU-native heterogeneous Mixture-of-Experts diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cs2mosa/Heterogeneous-MOE-for-Diffusion-models (EDM-style diffusion with a
dual-path U-Net/ViT mixture-of-experts denoiser), built TPU-first:

- ``ops``      : magnitude-preserving primitives (normalize, mp_silu, mp_sum,
                 mp_cat, resample, Fourier features, MP conv/linear, MP
                 attention) as pure JAX functions + Pallas kernels for the hot
                 paths. Mirrors reference models/model_internals.py.
- ``models``   : routers, U-Net / ViT experts, static-shape MoE dispatch, and
                 the HDMOEM assembly + EDM preconditioning wrapper. Mirrors
                 reference models/model_components.py + model_config{1,2}.py.
- ``train``    : EDM loss + MoE auxiliary losses, sigma samplers, zeta/mask
                 schedulers, optax multi-group optimizer with MP weight
                 projection, orbax checkpointing, the training loop. Mirrors
                 reference Utils/{utils,training,configs}.py.
- ``sampler``  : 2nd-order Heun EDM sampler compiled to ``lax.scan``. Mirrors
                 reference Utils/EDM_sampler.py.
- ``adapters`` : frozen SD-VAE / CLIP text encoder adapters with deterministic
                 fakes for hermetic testing. Mirrors reference Utils/VAE_CLIP.py.
- ``parallel`` : jax.sharding Mesh construction, data/expert parallel sharding
                 rules, pjit-ed train steps (no reference analog: the reference
                 is single-device).
- ``obs``      : JSONL logger with the reference metric vocabulary, offline
                 plotter, jax.profiler hooks. Mirrors reference graphs/.
- ``serve``    : AOT-compiled batched sampling engine + queued/coalescing HTTP
                 frontend (no reference analog: the reference has no serving).
- ``deploy``   : serialized serving artifacts via jax.export — the compiled
                 sampler (+VAE decode, weights baked in) as one portable file.

All modules are parameter pytrees + pure apply functions; RNG is threaded
explicitly, everything jits with static shapes.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (compilecache.py): every entry point that
# imports the package — bench.py, the CLI, the queued revalidation scripts,
# the driver's dryrun, the tests — shares one on-disk executable cache, so
# the 5-10 min tunnel compiles of unchanged programs happen once per repo
# lifetime, not once per process. HDMOE_COMPILE_CACHE=off disables.
from hdmoe_tpu.compilecache import enable_persistent_cache as _enable_cache

_enable_cache()
del _enable_cache

from hdmoe_tpu.adapters.vae import StabilityVAE, FakeVAE, make_vae
from hdmoe_tpu.adapters.clip import CLIPTextEmbedder, FakeCLIP, make_text_encoder

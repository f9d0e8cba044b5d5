from vgd_tpu.models.gan import Generator, Discriminator
from vgd_tpu.models.vae import Encoder, reparameterize, kl_divergence

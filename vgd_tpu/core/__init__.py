from vgd_tpu.core.rng import seed_all, key_iter, fold
from vgd_tpu.core import config

from vgd_tpu.io.checkpoint import Checkpointer
from vgd_tpu.io import artifacts

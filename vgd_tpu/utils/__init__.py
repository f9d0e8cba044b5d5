from vgd_tpu.utils.viz import show_tensor_image, save_gif
from vgd_tpu.utils.prefetch import device_prefetch

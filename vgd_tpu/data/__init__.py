from vgd_tpu.data.corrupt import add_gaussian_noise, add_occlusion_rectangle, corrupt
from vgd_tpu.data.celeba import make_image_datasets, ArrayDataset, Loader
from vgd_tpu.data import eeg

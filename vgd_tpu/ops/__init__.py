from vgd_tpu.ops.conv import conv_transpose2d, ConvTranspose
from vgd_tpu.ops.image import to_signed, to_unit, signed_to_unit, unit_to_uint8
from vgd_tpu.ops.initializers import dcgan_conv_init, dcgan_bn_scale_init

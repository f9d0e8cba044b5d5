from vgd_tpu.train.common import NetState, bce, mse

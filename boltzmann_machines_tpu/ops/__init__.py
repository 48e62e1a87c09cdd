from .pallas_ops import bernoulli_sample, make_cd_epoch_kernel

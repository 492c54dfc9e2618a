from bilinear_tpu.core.initializers import (
    kaiming_normal,
    torch_bias_init,
    torch_conv_default_kernel,
    torch_linear_default_kernel,
)
from bilinear_tpu.core.norm import TorchBatchNorm, reset_batch_stats
from bilinear_tpu.core.optim import (
    bilinear_optimizer,
    hourglass_optimizer,
    reference_bilinear_schedule,
    torch_adam,
    torch_clip_grad_norm,
    torch_rmsprop,
)

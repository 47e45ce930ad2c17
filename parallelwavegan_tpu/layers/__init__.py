"""Flax layer library (channels-last TPU modules)."""

from parallelwavegan_tpu.layers.causal_conv import (  # noqa: F401
    CausalConv1d,
    CausalConvTranspose1d,
)
from parallelwavegan_tpu.layers.common import (  # noqa: F401
    ChannelLayerNorm,
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    Dense,
    get_activation,
    instance_norm_1d,
    kaiming_normal_relu_init,
    mean_filter_init,
    normal_init,
    pad_mode_from_torch,
    torch_conv_default_init,
    zeros_init,
)
from parallelwavegan_tpu.layers.duration import (  # noqa: F401
    DurationPredictor,
    VariancePredictor,
    length_regulator,
    length_regulator_np,
)
from parallelwavegan_tpu.layers.pqmf import PQMF  # noqa: F401
from parallelwavegan_tpu.layers.residual_block import (  # noqa: F401
    HiFiGANResidualBlock,
    WaveNetResidualBlock,
)
from parallelwavegan_tpu.layers.residual_stack import ResidualStack  # noqa: F401
from parallelwavegan_tpu.layers.tade import TADELayer, TADEResBlock  # noqa: F401
from parallelwavegan_tpu.layers.upsample import (  # noqa: F401
    ConvInUpsampleNetwork,
    UpsampleNetwork,
)
from parallelwavegan_tpu.layers.vq import VQCodebook  # noqa: F401

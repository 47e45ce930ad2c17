"""Pure-function DSP and conv primitives (the TPU compute path)."""

from parallelwavegan_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    pad1d,
)
from parallelwavegan_tpu.ops.mel import mel_filter_bank  # noqa: F401
from parallelwavegan_tpu.ops.pqmf import (  # noqa: F401
    design_prototype_filter,
    pqmf_analysis,
    pqmf_filters,
    pqmf_synthesis,
)
from parallelwavegan_tpu.ops.spectral import (  # noqa: F401
    log_mel_spectrogram,
    stft_magnitude,
)

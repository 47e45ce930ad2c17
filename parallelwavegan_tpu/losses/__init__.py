"""Loss functions (pure, pytree-aware)."""

from parallelwavegan_tpu.losses.adversarial import (  # noqa: F401
    DiscriminatorAdversarialLoss,
    GeneratorAdversarialLoss,
)
from parallelwavegan_tpu.losses.duration import DurationPredictorLoss  # noqa: F401
from parallelwavegan_tpu.losses.feat_match import FeatureMatchLoss  # noqa: F401
from parallelwavegan_tpu.losses.mel_loss import MelSpectrogramLoss  # noqa: F401
from parallelwavegan_tpu.losses.stft_loss import (  # noqa: F401
    MultiResolutionSTFTLoss,
    STFTLoss,
)

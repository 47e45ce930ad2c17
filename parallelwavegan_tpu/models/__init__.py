"""Model families + name registry (replaces the reference's getattr factory,
/root/reference/parallel_wavegan/bin/train.py:1428-1437)."""

from parallelwavegan_tpu.models.hifigan import (  # noqa: F401
    HiFiGANGenerator,
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    HiFiGANPeriodDiscriminator,
    HiFiGANScaleDiscriminator,
)
from parallelwavegan_tpu.models.melgan import (  # noqa: F401
    MelGANDiscriminator,
    MelGANGenerator,
    MelGANMultiScaleDiscriminator,
)
from parallelwavegan_tpu.models.parallel_wavegan import (  # noqa: F401
    ParallelWaveGANDiscriminator,
    ParallelWaveGANGenerator,
    ResidualParallelWaveGANDiscriminator,
)
from parallelwavegan_tpu.models.discrete import (  # noqa: F401
    DiscreteSymbolDurationGenerator,
    DiscreteSymbolF0Generator,
    DiscreteSymbolHiFiGANGenerator,
    DiscreteSymbolStyleMelGANGenerator,
)
from parallelwavegan_tpu.models.style_melgan import (  # noqa: F401
    StyleMelGANDiscriminator,
    StyleMelGANGenerator,
)
from parallelwavegan_tpu.models.uhifigan import UHiFiGANGenerator  # noqa: F401
from parallelwavegan_tpu.models.vqvae import VQVAE  # noqa: F401

_REGISTRY = {
    "ParallelWaveGANGenerator": ParallelWaveGANGenerator,
    "ParallelWaveGANDiscriminator": ParallelWaveGANDiscriminator,
    "ResidualParallelWaveGANDiscriminator": ResidualParallelWaveGANDiscriminator,
    "MelGANGenerator": MelGANGenerator,
    "MelGANDiscriminator": MelGANDiscriminator,
    "MelGANMultiScaleDiscriminator": MelGANMultiScaleDiscriminator,
    "HiFiGANGenerator": HiFiGANGenerator,
    "HiFiGANPeriodDiscriminator": HiFiGANPeriodDiscriminator,
    "HiFiGANMultiPeriodDiscriminator": HiFiGANMultiPeriodDiscriminator,
    "HiFiGANScaleDiscriminator": HiFiGANScaleDiscriminator,
    "HiFiGANMultiScaleDiscriminator": HiFiGANMultiScaleDiscriminator,
    "HiFiGANMultiScaleMultiPeriodDiscriminator": (
        HiFiGANMultiScaleMultiPeriodDiscriminator
    ),
    "StyleMelGANGenerator": StyleMelGANGenerator,
    "StyleMelGANDiscriminator": StyleMelGANDiscriminator,
    "UHiFiGANGenerator": UHiFiGANGenerator,
    "VQVAE": VQVAE,
    "DiscreteSymbolHiFiGANGenerator": DiscreteSymbolHiFiGANGenerator,
    "DiscreteSymbolDurationGenerator": DiscreteSymbolDurationGenerator,
    "DiscreteSymbolF0Generator": DiscreteSymbolF0Generator,
    "DiscreteSymbolStyleMelGANGenerator": DiscreteSymbolStyleMelGANGenerator,
}


def register_model(name, cls):
    _REGISTRY[name] = cls


def get_model_class(name: str):
    """Resolve a reference-config model name to our flax class."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model: {name}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]

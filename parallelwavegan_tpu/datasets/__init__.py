"""Datasets: directory-scan feature dumps, Kaldi scp readers, collater."""

from parallelwavegan_tpu.datasets.audio_mel_dataset import (  # noqa: F401
    AudioDataset,
    AudioGlobalDataset,
    AudioLocalDataset,
    AudioMelDataset,
    AudioMelF0Dataset,
    AudioMelF0ExcitationDataset,
    MelDataset,
    MelF0Dataset,
    MelF0ExcitationDataset,
)
from parallelwavegan_tpu.datasets.collater import Collater  # noqa: F401
from parallelwavegan_tpu.datasets.scp_dataset import (  # noqa: F401
    AudioMelSCPDataset,
    AudioSCPDataset,
    MelSCPDataset,
)

"""Loss bundle built from a (reference-compatible) experiment config
(mirrors /root/reference/parallel_wavegan/bin/train.py:1439-1516)."""

from __future__ import annotations

from typing import Any, Dict

from parallelwavegan_tpu.layers import PQMF
from parallelwavegan_tpu.losses import (
    DiscriminatorAdversarialLoss,
    DurationPredictorLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
)


def _win(name: str) -> str:
    return name.replace("_window", "")


def build_criterion(config: Dict[str, Any]) -> Dict[str, Any]:
    c: Dict[str, Any] = {}
    if config.get("use_stft_loss", True):
        p = dict(config.get("stft_loss_params", {}))
        if "window" in p:
            p["window"] = _win(p["window"])
        c["stft"] = MultiResolutionSTFTLoss(**p)
    if config.get("use_subband_stft_loss", False):
        p = dict(config["subband_stft_loss_params"])
        if "window" in p:
            p["window"] = _win(p["window"])
        c["sub_stft"] = MultiResolutionSTFTLoss(**p)
    if config.get("use_mel_loss", False):
        p = dict(config.get("mel_loss_params", {}))
        p.setdefault("fs", config.get("sampling_rate", 22050))
        c["mel"] = MelSpectrogramLoss(**p)
    c["gen_adv"] = GeneratorAdversarialLoss(
        **config.get("generator_adv_loss_params", {})
    )
    c["dis_adv"] = DiscriminatorAdversarialLoss(
        **config.get("discriminator_adv_loss_params", {})
    )
    if config.get("use_feat_match_loss", False):
        c["feat_match"] = FeatureMatchLoss(
            **config.get("feat_match_loss_params", {})
        )
    if (
        config.get("use_duration_prediction", False)
        or config.get("use_duration_loss", False)  # reference key name
        or "Duration" in config.get("generator_type", "")
    ):
        c["duration"] = DurationPredictorLoss(
            **(config.get("duration_loss_params") or {})
        )
    out_ch = config.get("generator_params", {}).get("out_channels", 1)
    if out_ch > 1 or config.get("generator_type", "") == "VQVAE":
        c["pqmf"] = PQMF(
            subbands=out_ch if out_ch > 1 else 4,
            **config.get("pqmf_params", {}),
        )
    return c

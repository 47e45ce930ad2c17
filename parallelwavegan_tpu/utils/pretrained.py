"""Pretrained-model registry (parity surface for the reference's
download_pretrained_model, /root/reference/parallel_wavegan/utils/utils.py:
22-58, 363-421).

This environment has no network egress, so `download_pretrained_model`
resolves tags from a local cache directory (PWG_TPU_CACHE or
~/.cache/parallelwavegan_tpu) that users populate out of band — e.g. by
downloading a reference tag with the reference tooling and converting it via
`python -m parallelwavegan_tpu.bin.convert_checkpoint`.
"""

from __future__ import annotations

import os
from typing import List

# reference model zoo tags (corpus_model.version); kept so tag strings used
# with the reference keep working here after conversion
PRETRAINED_MODEL_LIST: List[str] = [
    "ljspeech_parallel_wavegan.v1",
    "ljspeech_parallel_wavegan.v1.long",
    "ljspeech_parallel_wavegan.v1.no_limit",
    "ljspeech_parallel_wavegan.v3",
    "ljspeech_melgan.v1",
    "ljspeech_melgan.v1.long",
    "ljspeech_melgan.v3",
    "ljspeech_melgan.v3.long",
    "ljspeech_full_band_melgan.v2",
    "ljspeech_multi_band_melgan.v2",
    "ljspeech_hifigan.v1",
    "ljspeech_style_melgan.v1",
    "jsut_parallel_wavegan.v1",
    "jsut_multi_band_melgan.v2",
    "jsut_hifigan.v1",
    "jsut_style_melgan.v1",
    "csmsc_parallel_wavegan.v1",
    "csmsc_multi_band_melgan.v2",
    "csmsc_hifigan.v1",
    "csmsc_style_melgan.v1",
    "arctic_slt_parallel_wavegan.v1",
    "jnas_parallel_wavegan.v1",
    "vctk_parallel_wavegan.v1",
    "vctk_parallel_wavegan.v1.long",
    "vctk_multi_band_melgan.v2",
    "vctk_hifigan.v1",
    "vctk_style_melgan.v1",
    "libritts_parallel_wavegan.v1",
    "libritts_parallel_wavegan.v1.long",
    "libritts_multi_band_melgan.v2",
    "libritts_hifigan.v1",
    "libritts_style_melgan.v1",
    "kss_parallel_wavegan.v1",
    "hui_acg_hokuspokus_parallel_wavegan.v1",
    "ruslan_parallel_wavegan.v1",
    "oniku_hifigan.v1",
]


def get_cache_dir() -> str:
    return os.environ.get(
        "PWG_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "parallelwavegan_tpu"),
    )


def download_pretrained_model(tag: str, download_dir: str | None = None) -> str:
    """Resolve a pretrained tag to a local checkpoint path.

    Looks for <cache>/<tag>/checkpoint-*.ckpt (converted) or
    <cache>/<tag>/*.pkl (raw reference checkpoint, loadable directly by
    load_model). Raises with instructions when absent (no egress here).
    """
    if tag not in PRETRAINED_MODEL_LIST:
        raise KeyError(
            f"unknown tag: {tag}; available: {PRETRAINED_MODEL_LIST}"
        )
    cache = download_dir or get_cache_dir()
    tag_dir = os.path.join(cache, tag)
    if os.path.isdir(tag_dir):
        for name in sorted(os.listdir(tag_dir)):
            if name.startswith("checkpoint") and (
                name.endswith(".ckpt") or name.endswith(".pkl")
            ):
                return os.path.join(tag_dir, name)
    raise FileNotFoundError(
        f"no cached checkpoint for {tag} under {tag_dir}. This environment "
        "has no network egress: download the tag with the reference "
        "tooling, place it under that directory (optionally convert with "
        "`python -m parallelwavegan_tpu.bin.convert_checkpoint`), and retry."
    )

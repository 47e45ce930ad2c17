"""Torch checkpoint importer: reference state_dicts -> flax param pytrees.

Enables (a) golden parity tests against the reference PyTorch models and
(b) loading the reference's published pretrained checkpoints
(checkpoint-<N>steps.pkl, /root/reference/parallel_wavegan/bin/train.py:118-150)
into this framework for copy-synthesis.

Layout conversions (torch -> ours):
  Conv1d  weight (O, I/g, K)   -> kernel (K, I/g, O)        transpose(2, 1, 0)
  ConvT1d weight (I, O/g, K)   -> kernel (K, I, O)          transpose(2, 0, 1)
  Conv2d  weight (O, I, Kh, Kw)-> kernel (Kh, Kw, I, O)     transpose(2, 3, 1, 0)
  Linear  weight (O, I)        -> kernel (I, O)             transpose(1, 0)
  weight_g (O, 1, ...)         -> kernel_g (1, ..., O)
  Embedding weight             -> embedding (as-is)
  spectral-norm weight_orig    -> kernel; weight_u -> spectral collection

Name maps are per model family; each rule yields (our_path, kind).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "import_generator_params",
    "import_discriminator_params",
    "import_model_params",
    "load_torch_checkpoint",
]


# ---------------------------------------------------------------------------
# key translation
# ---------------------------------------------------------------------------
def _melgan_sequential_map(config: Dict[str, Any]) -> Dict[str, Tuple[str, str]]:
    """Map MelGANGenerator torch Sequential indices -> our layer_{li}."""
    scales = list(config.get("upsample_scales", [8, 8, 2, 2]))
    stacks = config.get("stacks", 3)
    causal = config.get("use_causal_conv", False)
    out: Dict[str, Tuple[str, str]] = {}
    li = 0
    ti = 0
    if not causal:
        ti += 1  # pad
        out[f"melgan.{ti}"] = (f"layer_{li}", "conv1d")
        ti += 1
    else:
        out[f"melgan.{ti}.conv"] = (f"layer_{li}/conv", "conv1d")
        ti += 1
    li += 1
    for _ in scales:
        ti += 1  # act
        if not causal:
            out[f"melgan.{ti}"] = (f"layer_{li}", "convt1d")
        else:
            out[f"melgan.{ti}.deconv"] = (f"layer_{li}/deconv", "convt1d")
        ti += 1
        li += 1
        for _ in range(stacks):
            base = f"melgan.{ti}"
            if not causal:
                out[f"{base}.stack.2"] = (f"layer_{li}/conv_dilated", "conv1d")
                out[f"{base}.stack.4"] = (f"layer_{li}/conv1x1", "conv1d")
            else:
                out[f"{base}.stack.1.conv"] = (
                    f"layer_{li}/conv_dilated/conv", "conv1d"
                )
                out[f"{base}.stack.3"] = (f"layer_{li}/conv1x1", "conv1d")
            out[f"{base}.skip_layer"] = (f"layer_{li}/skip_layer", "conv1d")
            ti += 1
            li += 1
    ti += 1  # act
    if not causal:
        ti += 1  # pad
        out[f"melgan.{ti}"] = (f"layer_{li}", "conv1d")
        ti += 1
    else:
        out[f"melgan.{ti}.conv"] = (f"layer_{li}/conv", "conv1d")
        ti += 1
    return out


def _melgan_discriminator_rules(prefix_t: str = "", prefix_o: str = ""):
    def rule(key):
        m = re.match(rf"^{prefix_t}layers\.(\d+)(?:\.\d+)?$", key)
        if m:
            return f"{prefix_o}layer_{m.group(1)}", "conv1d"
        return None

    return rule


def _pwg_generator_rule(config):
    upsample_params = config.get("upsample_params", {}) or {}
    has_act = upsample_params.get("nonlinear_activation") is not None
    step = 3 if has_act else 2

    def rule(key):
        if key == "first_conv":
            return "first_conv", "conv1d"
        if key == "upsample_net.conv_in":
            return "upsample_net/conv_in", "conv1d"
        m = re.match(r"^upsample_net\.upsample\.up_layers\.(\d+)$", key)
        if m:
            i = int(m.group(1))
            return f"upsample_net/upsample/conv_{(i - 1) // step}", "conv2d"
        m = re.match(r"^upsample_net\.up_layers\.(\d+)$", key)
        if m:
            i = int(m.group(1))
            return f"upsample_net/conv_{(i - 1) // step}", "conv2d"
        m = re.match(
            r"^conv_layers\.(\d+)\.(conv|conv1x1_aux|conv1x1_skip|conv1x1_out)$",
            key,
        )
        if m:
            return f"conv_layers_{m.group(1)}/{m.group(2)}", "conv1d"
        m = re.match(r"^last_conv_layers\.(\d+)$", key)
        if m:
            return f"last_conv_{(int(m.group(1)) - 1) // 2}", "conv1d"
        return None

    return rule


def _pwg_discriminator_rule(config):
    layers = config.get("layers", 10)

    def rule(key):
        m = re.match(r"^conv_layers\.(\d+)$", key)
        if m:
            i = int(m.group(1)) // 2
            if i >= layers - 1:
                return "last_conv", "conv1d"
            return f"conv_{i}", "conv1d"
        return None

    return rule


def _rpwg_discriminator_rule(config):
    def rule(key):
        if key == "first_conv.0":
            return "first_conv", "conv1d"
        m = re.match(
            r"^conv_layers\.(\d+)\.(conv|conv1x1_aux|conv1x1_skip|conv1x1_out)$",
            key,
        )
        if m:
            return f"conv_layers_{m.group(1)}/{m.group(2)}", "conv1d"
        m = re.match(r"^last_conv_layers\.(\d+)$", key)
        if m:
            return f"last_conv_{(int(m.group(1)) - 1) // 2}", "conv1d"
        return None

    return rule


def _hifigan_generator_rule(config):
    def rule(key):
        if key == "input_conv":
            return "input_conv", "conv1d"
        if key == "input_conv.conv":
            return "input_conv/conv", "conv1d"
        m = re.match(r"^upsamples\.(\d+)\.1$", key)
        if m:
            return f"upsamples_{m.group(1)}", "convt1d"
        m = re.match(r"^upsamples\.(\d+)\.1\.deconv$", key)
        if m:
            return f"upsamples_{m.group(1)}/deconv", "convt1d"
        m = re.match(r"^blocks\.(\d+)\.(convs1|convs2)\.(\d+)\.1(\.conv)?$", key)
        if m:
            sub = f"{m.group(2)}_{m.group(3)}"
            tail = "/conv" if m.group(4) else ""
            return f"blocks_{m.group(1)}/{sub}{tail}", "conv1d"
        if key == "output_conv.1":
            return "output_conv", "conv1d"
        if key == "output_conv.1.conv":
            return "output_conv/conv", "conv1d"
        return None

    return rule


def _hifigan_period_rule(prefix_t: str = "", prefix_o: str = ""):
    def rule(key):
        m = re.match(rf"^{prefix_t}convs\.(\d+)\.0$", key)
        if m:
            return f"{prefix_o}convs_{m.group(1)}", "conv2d"
        if re.match(rf"^{prefix_t}output_conv$", key):
            return f"{prefix_o}output_conv", "conv2d"
        return None

    return rule


def _multi(rule_fn, list_name="discriminators"):
    def rule(key):
        m = re.match(rf"^{list_name}\.(\d+)\.(.*)$", key)
        if m:
            sub = rule_fn(m.group(2))
            if sub is None:
                return None
            path, kind = sub
            return f"{list_name}_{m.group(1)}/{path}", kind
        return None

    return rule


def _msmpd_rule(config):
    msd = _multi(_hifigan_scale_rule())
    mpd = _multi(_hifigan_period_rule())

    def rule(key):
        if key.startswith("msd."):
            sub = msd(key[4:])
            if sub:
                return f"msd/{sub[0]}", sub[1]
        if key.startswith("mpd."):
            sub = mpd(key[4:])
            if sub:
                return f"mpd/{sub[0]}", sub[1]
        return None

    return rule


def _hifigan_scale_rule():
    def rule(key):
        m = re.match(r"^layers\.(\d+)(?:\.0)?$", key)
        if m:
            return f"layer_{m.group(1)}", "conv1d"
        return None

    return rule


def _style_melgan_generator_rule(config):
    def rule(key):
        m = re.match(r"^noise_upsample\.(\d+)$", key)
        if m:
            return f"noise_upsample_{int(m.group(1)) // 2}", "convt1d"
        m = re.match(
            r"^blocks\.(\d+)\.(tade1|tade2)\.(aux_conv|gated_conv)\.0$", key
        )
        if m:
            return f"blocks_{m.group(1)}/{m.group(2)}/{m.group(3)}", "conv1d"
        m = re.match(r"^blocks\.(\d+)\.(gated_conv1|gated_conv2)$", key)
        if m:
            return f"blocks_{m.group(1)}/{m.group(2)}", "conv1d"
        if key == "output_conv.0":
            return "output_conv", "conv1d"
        return None

    return rule


def _token_embed_rule(config: Dict[str, Any]):
    """emb/spk_emb heads shared by the DiscreteSymbol* generators
    (reference hifigan.py:907-921, style_melgan.py:413-419)."""
    num_spk = config.get("num_spk_embs", 128)

    def rule(key):
        if key == "emb":
            return "emb", "embedding"
        if key == "spk_emb":
            # reference constructs spk_emb unconditionally; only map it when
            # the config actually routes speaker ids through it
            return ("spk_emb", "embedding") if num_spk > 0 else None
        m = re.match(r"^emb\.(\d+)$", key)
        if m:  # per-HuBERT-layer embeddings (weight-sum mode, hifigan.py:1431)
            return f"emb_{m.group(1)}", "embedding"
        return None

    return rule


def _discrete_hifigan_rule(config: Dict[str, Any]):
    token = _token_embed_rule(config)
    trunk = _hifigan_generator_rule(config)

    def rule(key):
        sub = token(key)
        if sub:
            return sub
        sub = trunk(key)
        if sub:
            return f"trunk/{sub[0]}", sub[1]
        return None

    return rule


def _discrete_duration_rule(config: Dict[str, Any]):
    base = _discrete_hifigan_rule(config)

    def rule(key):
        m = re.match(r"^duration_predictor\.conv\.(\d+)\.0$", key)
        if m:
            return f"duration_predictor/conv_{m.group(1)}", "conv1d"
        m = re.match(r"^duration_predictor\.conv\.(\d+)\.2$", key)
        if m:  # dim-selectable LayerNorm (layers/layer_norm.py)
            return f"duration_predictor/norm_{m.group(1)}", "norm"
        if key == "duration_predictor.linear":
            return "duration_predictor/linear", "dense"
        return base(key)

    return rule


def _discrete_f0_rule(config: Dict[str, Any]):
    base = _discrete_hifigan_rule(config)

    def rule(key):
        if key == "f0_embedding":
            return "f0_embedding", "dense"
        if key == "weights":  # layer weight-sum logits (hifigan.py:1443)
            return "weights", "param"
        return base(key)

    return rule


def _discrete_style_melgan_rule(config: Dict[str, Any]):
    token = _token_embed_rule(config)
    trunk = _style_melgan_generator_rule(config)

    def rule(key):
        sub = token(key)
        if sub:
            return sub
        sub = trunk(key)
        if sub:
            return f"trunk/{sub[0]}", sub[1]
        return None

    return rule


def _uhifigan_generator_rule(config: Dict[str, Any]):
    def rule(key):
        if key == "input_conv.0":
            return "input_conv", "conv1d"
        if key == "hidden_conv":
            return "hidden_conv", "conv1d"
        if key == "output_conv.1":
            return "output_conv", "conv1d"
        m = re.match(r"^downsamples\.(\d+)\.0$", key)
        if m:
            return f"downsamples_{m.group(1)}", "conv1d"
        m = re.match(r"^upsamples\.(\d+)\.1$", key)
        if m:
            return f"upsamples_{m.group(1)}", "convt1d"
        m = re.match(
            r"^(downsamples_mrf|upsamples_mrf)\.(\d+)\.(convs1|convs2)\.(\d+)\.1$",
            key,
        )
        if m:
            return (
                f"{m.group(1)}_{m.group(2)}/{m.group(3)}_{m.group(4)}",
                "conv1d",
            )
        return None

    return rule


def _vqvae_rule(config: Dict[str, Any]):
    decoder_conf = config.get("decoder_conf", {}) or {}
    dec_map = _melgan_sequential_map(decoder_conf)
    enc = _melgan_discriminator_rules()

    def rule(key):
        if key == "codebook.embedding":
            return "codebook", "embedding"
        if key == "local_embed":
            return "local_embed", "conv1d"
        if key == "global_embed":
            return "global_embed", "embedding"
        if key.startswith("encoder."):
            sub = enc(key[len("encoder."):])
            if sub:
                return f"encoder/{sub[0]}", sub[1]
        if key.startswith("decoder."):
            sub = dec_map.get(key[len("decoder."):])
            if sub:
                return f"decoder/{sub[0]}", sub[1]
        return None

    return rule


def _rule_for(model_name: str, config: Dict[str, Any]):
    if model_name == "ParallelWaveGANGenerator":
        return _pwg_generator_rule(config)
    if model_name == "ParallelWaveGANDiscriminator":
        return _pwg_discriminator_rule(config)
    if model_name == "ResidualParallelWaveGANDiscriminator":
        return _rpwg_discriminator_rule(config)
    if model_name == "MelGANGenerator":
        mapping = _melgan_sequential_map(config)
        return lambda key: mapping.get(key)
    if model_name == "MelGANDiscriminator":
        return _melgan_discriminator_rules()
    if model_name == "MelGANMultiScaleDiscriminator":
        return _multi(_melgan_discriminator_rules())
    if model_name == "HiFiGANGenerator":
        return _hifigan_generator_rule(config)
    if model_name == "HiFiGANPeriodDiscriminator":
        return _hifigan_period_rule()
    if model_name == "HiFiGANMultiPeriodDiscriminator":
        return _multi(_hifigan_period_rule())
    if model_name == "HiFiGANScaleDiscriminator":
        return _hifigan_scale_rule()
    if model_name == "HiFiGANMultiScaleDiscriminator":
        return _multi(_hifigan_scale_rule())
    if model_name == "HiFiGANMultiScaleMultiPeriodDiscriminator":
        return _msmpd_rule(config)
    if model_name == "StyleMelGANGenerator":
        return _style_melgan_generator_rule(config)
    if model_name == "StyleMelGANDiscriminator":
        return _multi(_melgan_discriminator_rules())
    if model_name == "DiscreteSymbolHiFiGANGenerator":
        return _discrete_hifigan_rule(config)
    if model_name == "DiscreteSymbolDurationGenerator":
        return _discrete_duration_rule(config)
    if model_name == "DiscreteSymbolF0Generator":
        return _discrete_f0_rule(config)
    if model_name == "DiscreteSymbolStyleMelGANGenerator":
        return _discrete_style_melgan_rule(config)
    if model_name == "UHiFiGANGenerator":
        return _uhifigan_generator_rule(config)
    if model_name == "VQVAE":
        return _vqvae_rule(config)
    raise KeyError(f"no importer rules for {model_name}")


# ---------------------------------------------------------------------------
# tensor conversion
# ---------------------------------------------------------------------------
def _convert(kind: str, name: str, w: np.ndarray) -> Tuple[str, np.ndarray]:
    """(torch leaf name, tensor) -> (our param name, converted tensor)."""
    if name == "bias":
        return "bias", w
    if kind == "conv1d":
        perm = (2, 1, 0)
    elif kind == "convt1d":
        perm = (2, 0, 1)
    elif kind == "conv2d":
        perm = (2, 3, 1, 0)
    elif kind == "dense":
        perm = (1, 0)
    elif kind == "embedding":
        # torch nn.Embedding weight -> flax nn.Embed "embedding" (same layout)
        if name == "weight":
            return "embedding", w
        perm = None
    elif kind == "norm":
        return ("scale" if name == "weight" else name), w
    else:
        raise ValueError(kind)

    def t(x):
        return x.transpose(perm) if perm else x

    if name in ("weight", "weight_orig"):
        return "kernel", t(w)
    if name == "weight_v":
        return "kernel_v", t(w)
    if name == "weight_g":
        g = w.reshape(w.shape[0])
        if kind == "convt1d":
            # torch g is per *input* channel: (I, 1, 1) -> ours (1, I, 1)
            return "kernel_g", g.reshape(1, g.shape[0], 1)
        # torch g: (O, 1, 1[, 1]) -> ours (1, ..., 1, O)
        shape = [1] * (w.ndim - 1) + [g.shape[0]]
        return "kernel_g", g.reshape(shape)
    raise ValueError(f"unsupported leaf {name} for kind {kind}")


def _set_path(tree: Dict[str, Any], path: str, name: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[name] = value


def import_model_params(
    state_dict: Dict[str, Any],
    model_name: str,
    config: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Translate a torch state_dict into variable collections.

    Returns {"params": ..., optionally "spectral": ...}. Ignores non-param
    buffers (PQMF filters, mean/scale stats — fetch those separately).
    """
    config = config or {}
    rule = _rule_for(model_name, config)
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    skipped: List[str] = []
    for key, tensor in state_dict.items():
        # np.array (not asarray): torch updates some tensors in place
        # (spectral-norm u), so never alias torch storage
        w = np.array(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                     else tensor, dtype=np.float32, copy=True)
        # bare top-level parameters (e.g. the F0 generator's layer-sum
        # `weights`, hifigan.py:1443) have no module prefix: match the whole
        # key and store directly
        if "." not in key:
            direct = rule(key)
            if direct is not None and direct[1] == "param":
                params[direct[0]] = w
                continue
        if "." in key:
            prefix, leaf = key.rsplit(".", 1)
        else:
            prefix, leaf = "", key
        if leaf in ("mean", "scale") and prefix == "":
            skipped.append(key)
            continue
        if leaf in ("analysis_filter", "synthesis_filter", "updown_filter",
                    "window", "melmat"):
            skipped.append(key)
            continue
        mapped = rule(prefix)
        if mapped is None:
            skipped.append(key)
            continue
        path, kind = mapped
        if leaf == "weight_u":
            _set_path(spectral, path, "u", w)
            continue
        if leaf == "weight_v" and any(
            k == f"{prefix}.weight_orig" for k in state_dict
        ):
            continue  # spectral-norm power-iteration vector; recomputed
        name, value = _convert(kind, leaf, w)
        _set_path(params, path, name, value)
    out = {"params": params}
    if spectral:
        out["spectral"] = spectral
    if skipped:
        import logging

        logging.debug("torch_import skipped keys: %s", skipped)
    return out


def import_generator_params(state_dict, model_name, config=None):
    return import_model_params(state_dict, model_name, config)


def import_discriminator_params(state_dict, model_name, config=None):
    return import_model_params(state_dict, model_name, config)


def load_torch_checkpoint(path: str):
    """Load a reference checkpoint-<N>steps.pkl via torch (CPU)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)

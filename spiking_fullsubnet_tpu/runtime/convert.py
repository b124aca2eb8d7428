"""Import reference (torch) checkpoints into this framework's pytrees.

Maps the reference's parameter naming — both generations — onto the
spiking_fullsubnet param/state pytrees:

- latest (audiozen SpikingFullSubNet, modeling_spiking_fullsubnet.py:349):
  fb_model.pre_layer_norm.*, fb_model.sequence_model.layers.{i}.cell.*,
  fb_model.proj.*, sb_model.sb_models.{k}.*
- frozen (Separator, model_low_freq.py:485): same cell structure but the
  projection is `fc_output_layer` and there is no pre-LayerNorm.

The actual unpickling of `pytorch_model.bin` uses torch when available (a
one-shot conversion path — torch never enters the runtime), with the result
stored as flat numpy .npz for torch-free reload.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..models.spiking_fullsubnet import SpikingFullSubNetConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin/.pt state dict to numpy (one-shot, needs torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def _seq_model_from_sd(
    sd: Mapping[str, np.ndarray], prefix: str, num_layers: int, bn: bool
):
    """Build one SequenceModel params/state from torch names under prefix."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {"stack": {"layers": [{} for _ in range(num_layers)]}}

    if f"{prefix}.pre_layer_norm.weight" in sd:
        params["pre_ln"] = {
            "weight": jnp.asarray(sd[f"{prefix}.pre_layer_norm.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.pre_layer_norm.bias"]),
        }

    layers = []
    for i in range(num_layers):
        cp = f"{prefix}.sequence_model.layers.{i}.cell"
        layer = {
            "weight_ih": jnp.asarray(sd[f"{cp}.weight_ih"]),
            "weight_hh": jnp.asarray(sd[f"{cp}.weight_hh"]),
            "bias_ih": jnp.asarray(sd[f"{cp}.bias_ih"]),
        }
        if bn:
            layer["bn"] = {
                "weight": jnp.asarray(sd[f"{cp}.batchnorm.weight"]),
                "bias": jnp.asarray(sd[f"{cp}.batchnorm.bias"]),
            }
            state["stack"]["layers"][i]["bn"] = {
                "running_mean": jnp.asarray(sd[f"{cp}.batchnorm.running_mean"]),
                "running_var": jnp.asarray(sd[f"{cp}.batchnorm.running_var"]),
            }
        layers.append(layer)
    params["stack"] = {"layers": layers}

    for proj_name in ("proj", "fc_output_layer"):
        if f"{prefix}.{proj_name}.weight" in sd:
            params["proj"] = {
                "weight": jnp.asarray(sd[f"{prefix}.{proj_name}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.{proj_name}.bias"]),
            }
            break
    return params, state


def import_spiking_fullsubnet(
    sd: Mapping[str, np.ndarray], cfg: SpikingFullSubNetConfig
):
    """torch state dict -> (params, state) for spiking_fullsubnet_apply.

    Accepts both generations' checkpoints, including Accelerate's
    `pytorch_model.bin` (keys may carry a leading "module." from DDP).
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    fb_params, fb_state = _seq_model_from_sd(sd, "fb_model", cfg.fb_num_layers, cfg.bn)
    sb_params, sb_states = [], []
    for k in range(cfg.num_sections):
        p, s = _seq_model_from_sd(sd, f"sb_model.sb_models.{k}", cfg.sb_num_layers, cfg.bn)
        sb_params.append(p)
        sb_states.append(s)
    return {"fb": fb_params, "sb": sb_params}, {"fb": fb_state, "sb": sb_states}


def import_discriminator(sd: Mapping[str, np.ndarray], ndf: int = 16):
    """torch Discriminator state dict -> discriminator_apply params.

    Maps the reference's spectral-norm naming (weight_orig/weight_u/weight_v,
    discriminator.py:16-52) onto models/discriminator.py's param pytree; the
    layer indices follow the reference's nn.Sequential layout (4x [Conv2d,
    InstanceNorm2d, PReLU] at 0..11, fc1@14, PReLU@16, fc2@17,
    LearnableSigmoid@18). Used to import the model-zoo GAN discriminators
    (the only weights the reference snapshot ships for baseline_{l,xl}).
    """
    from ..models.discriminator import discriminator_init
    import jax

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params = discriminator_init(jax.random.PRNGKey(0), ndf=ndf)
    conv_ids, in_ids, pr_ids = [0, 3, 6, 9], [1, 4, 7, 10], [2, 5, 8, 11]
    for j in range(4):
        params["convs"][j]["weight"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_orig"])
        params["convs"][j]["u"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_u"])
        params["convs"][j]["v"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_v"])
        params["inorm"][j] = {
            "weight": jnp.asarray(sd[f"layers.{in_ids[j]}.weight"]),
            "bias": jnp.asarray(sd[f"layers.{in_ids[j]}.bias"]),
        }
        params["prelu"][j] = jnp.asarray(sd[f"layers.{pr_ids[j]}.weight"])
    for name, idx in (("fc1", 14), ("fc2", 17)):
        params[name]["weight"] = jnp.asarray(sd[f"layers.{idx}.weight_orig"])
        params[name]["bias"] = jnp.asarray(sd[f"layers.{idx}.bias"])
        params[name]["u"] = jnp.asarray(sd[f"layers.{idx}.weight_u"])
        params[name]["v"] = jnp.asarray(sd[f"layers.{idx}.weight_v"])
    params["prelu_fc"] = jnp.asarray(sd["layers.16.weight"])
    params["sigmoid_slope"] = jnp.asarray(sd["layers.18.slope"])
    return params


def save_npz(path: str, pytree) -> None:
    """Flatten a pytree of arrays into an .npz (torch-free reload format)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(pytree)
    out = {}
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_npz(path: str, template) -> Dict:
    """Restore a pytree saved by save_npz; structure comes from `template`."""
    import jax

    with np.load(path) as data:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for keypath, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
            arr = data[key]
            if arr.shape != tuple(leaf.shape):
                raise ValueError(f"{key}: checkpoint shape {arr.shape} != model {leaf.shape}")
            leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)

"""Parity tests for the non-flagship model zoo: cirm models, FullSubNet,
ConvTasNet, discriminator — all vs reference torch implementations with
identical weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.models import (
    CirmModelConfig,
    ConvTasNetConfig,
    FullSubNetConfig,
    cirm_model_apply,
    cirm_model_init,
    conv_tasnet_apply,
    conv_tasnet_init,
    discriminator_apply,
    discriminator_init,
    fullsubnet_apply,
    fullsubnet_init,
)

from reference_oracle import add_reference_to_path

add_reference_to_path()


@pytest.fixture(autouse=True)
def _oracle_stubs():
    # Stubs are removed after every test (conftest); tests in this module
    # lazily import oracle modules, so re-install per test.
    add_reference_to_path()


def _np(p):
    return p.detach().cpu().numpy()


# ----------------------------------------------------------------- cirm_gsn


def test_cirm_gsn_parity():
    from audiozen.models.cirm_gsn.modeling_cirm_gsn import Model as RefModel

    torch.manual_seed(1)
    kw = dict(
        n_fft=512, hop_length=128, win_length=512, fdrc=0.5, input_size=257,
        hidden_size=64, num_layers=2, proj_size=257, output_activate_function=None,
        df_order=3, use_pre_layer_norm_fb=True, bn=True, shared_weights=True,
        sequence_model="GSN", num_spks=1,
    )
    ref = RefModel(**kw)
    ref.eval()

    cfg = CirmModelConfig(**kw)
    params, state = cirm_model_init(jax.random.PRNGKey(0), cfg)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}
    # map fb_model.* names into our pytree
    from spiking_fullsubnet_tpu.runtime.convert import _seq_model_from_sd

    fb_params, fb_state = _seq_model_from_sd(sd, "fb_model", cfg.num_layers, cfg.bn)
    params, state = {"fb": fb_params}, {"fb": fb_state}

    x = np.random.randn(2, 16000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_y, ref_mag = ref(torch.from_numpy(x))
    out = cirm_model_apply(cfg, params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out["enhanced_y"]), ref_y.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["enhanced_mag"]), ref_mag.numpy(), atol=5e-4)


# ----------------------------------------------------------------- fullsubnet


def test_fullsubnet_parity():
    from audiozen.models.fullsubnet import Model as RefModel

    torch.manual_seed(2)
    kw = dict(
        num_freqs=257, look_ahead=2, sequence_model="LSTM", fb_num_neighbors=0,
        sb_num_neighbors=5, fb_output_activate_function="ReLU",
        sb_output_activate_function=False, fb_model_hidden_size=64,
        sb_model_hidden_size=48, norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2,
    )
    ref = RefModel(weight_init=False, **kw)
    ref.eval()

    cfg = FullSubNetConfig(
        **{**kw, "fb_output_activate_function": "relu", "sb_output_activate_function": None}
    )
    params = fullsubnet_init(jax.random.PRNGKey(0), cfg)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}

    def load_rnn(prefix, num_layers):
        stack = {"layers": []}
        for i in range(num_layers):
            stack["layers"].append(
                {
                    "fwd": {
                        "weight_ih": jnp.asarray(sd[f"{prefix}.sequence_model.weight_ih_l{i}"]),
                        "weight_hh": jnp.asarray(sd[f"{prefix}.sequence_model.weight_hh_l{i}"]),
                        "bias_ih": jnp.asarray(sd[f"{prefix}.sequence_model.bias_ih_l{i}"]),
                        "bias_hh": jnp.asarray(sd[f"{prefix}.sequence_model.bias_hh_l{i}"]),
                    }
                }
            )
        return {
            "stack": stack,
            "fc_output_layer": {
                "weight": jnp.asarray(sd[f"{prefix}.fc_output_layer.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.fc_output_layer.bias"]),
            },
        }

    params = {"fb_model": load_rnn("fb_model", 2), "sb_model": load_rnn("sb_model", 2)}

    x = np.abs(np.random.randn(3, 1, 257, 40)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ours = fullsubnet_apply(cfg, params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=5e-5)


# ----------------------------------------------------------------- conv_tasnet


def test_conv_tasnet_parity():
    from audiozen.models.conv_tasnet.modeling_conv_tasnet import ConvTasNet as RefModel

    torch.manual_seed(3)
    kw = dict(
        num_sources=2, enc_kernel_size=16, enc_num_feats=64, msk_kernel_size=3,
        msk_num_feats=32, msk_num_hidden_feats=64, msk_num_layers=3, msk_num_stacks=2,
        msk_activate="relu",
    )
    ref = RefModel(**kw)
    ref.eval()
    cfg = ConvTasNetConfig(**kw)
    params = conv_tasnet_init(jax.random.PRNGKey(0), cfg)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}

    params["encoder"]["weight"] = jnp.asarray(sd["encoder.weight"])
    params["input_norm"] = {
        "weight": jnp.asarray(sd["mask_generator.input_norm.weight"]),
        "bias": jnp.asarray(sd["mask_generator.input_norm.bias"]),
    }
    params["input_conv"] = {
        "weight": jnp.asarray(sd["mask_generator.input_conv.weight"]),
        "bias": jnp.asarray(sd["mask_generator.input_conv.bias"]),
    }
    for i in range(len(params["blocks"])):
        p = f"mask_generator.conv_layers.{i}"
        blk = params["blocks"][i]
        blk["conv1"] = {"weight": jnp.asarray(sd[f"{p}.conv_layers.0.weight"]), "bias": jnp.asarray(sd[f"{p}.conv_layers.0.bias"])}
        blk["prelu1"] = jnp.asarray(sd[f"{p}.conv_layers.1.weight"])
        blk["norm1"] = {"weight": jnp.asarray(sd[f"{p}.conv_layers.2.weight"]), "bias": jnp.asarray(sd[f"{p}.conv_layers.2.bias"])}
        blk["dconv"] = {"weight": jnp.asarray(sd[f"{p}.conv_layers.3.weight"]), "bias": jnp.asarray(sd[f"{p}.conv_layers.3.bias"])}
        blk["prelu2"] = jnp.asarray(sd[f"{p}.conv_layers.4.weight"])
        blk["norm2"] = {"weight": jnp.asarray(sd[f"{p}.conv_layers.5.weight"]), "bias": jnp.asarray(sd[f"{p}.conv_layers.5.bias"])}
        blk["skip_out"] = {"weight": jnp.asarray(sd[f"{p}.skip_out.weight"]), "bias": jnp.asarray(sd[f"{p}.skip_out.bias"])}
        if f"{p}.res_out.weight" in sd:
            blk["res_out"] = {"weight": jnp.asarray(sd[f"{p}.res_out.weight"]), "bias": jnp.asarray(sd[f"{p}.res_out.bias"])}
    params["output_prelu"] = jnp.asarray(sd["mask_generator.output_prelu.weight"])
    params["output_conv"] = {
        "weight": jnp.asarray(sd["mask_generator.output_conv.weight"]),
        "bias": jnp.asarray(sd["mask_generator.output_conv.bias"]),
    }
    params["decoder"] = {"weight_t": jnp.asarray(sd["decoder.weight"])}

    x = np.random.randn(2, 8000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    ours = conv_tasnet_apply(cfg, params, jnp.asarray(x))
    assert ours.shape == tuple(ref_out.shape)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=2e-4)


# ----------------------------------------------------------------- discriminator


def test_discriminator_parity():
    from audiozen.models.spiking_fullsubnet.discriminator import Discriminator as RefModel

    torch.manual_seed(4)
    ref = RefModel(ndf=8)
    ref.eval()
    params = discriminator_init(jax.random.PRNGKey(0), ndf=8)
    sd = {k: _np(v) for k, v in ref.state_dict().items()}

    conv_ids = [0, 3, 6, 9]
    in_ids = [1, 4, 7, 10]
    pr_ids = [2, 5, 8, 11]
    for j in range(4):
        params["convs"][j]["weight"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_orig"])
        params["convs"][j]["u"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_u"])
        params["convs"][j]["v"] = jnp.asarray(sd[f"layers.{conv_ids[j]}.weight_v"])
        params["inorm"][j] = {
            "weight": jnp.asarray(sd[f"layers.{in_ids[j]}.weight"]),
            "bias": jnp.asarray(sd[f"layers.{in_ids[j]}.bias"]),
        }
        params["prelu"][j] = jnp.asarray(sd[f"layers.{pr_ids[j]}.weight"])
    params["fc1"]["weight"] = jnp.asarray(sd["layers.14.weight_orig"])
    params["fc1"]["bias"] = jnp.asarray(sd["layers.14.bias"])
    params["fc1"]["u"] = jnp.asarray(sd["layers.14.weight_u"])
    params["fc1"]["v"] = jnp.asarray(sd["layers.14.weight_v"])
    params["prelu_fc"] = jnp.asarray(sd["layers.16.weight"])
    params["fc2"]["weight"] = jnp.asarray(sd["layers.17.weight_orig"])
    params["fc2"]["bias"] = jnp.asarray(sd["layers.17.bias"])
    params["fc2"]["u"] = jnp.asarray(sd["layers.17.weight_u"])
    params["fc2"]["v"] = jnp.asarray(sd["layers.17.weight_v"])
    params["sigmoid_slope"] = jnp.asarray(sd["layers.18.slope"])

    x = np.abs(np.random.randn(2, 257, 126)).astype(np.float32)
    y = np.abs(np.random.randn(2, 257, 126)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y))
    ours, _ = discriminator_apply(params, jnp.asarray(x), jnp.asarray(y), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=2e-5)

"""Named model presets (the published leaderboard sizes).

The flagship preset mirrors the reference's baseline_m.toml [model.args]
(/root/reference/recipes/intel_ndns/spiking_fullsubnet_freeze_phase/
baseline_m.toml: fb 320x2, sb 224x2, cutoffs [32,128], df [5,3,1],
centers [4,32,64], neighbors [15,15,15], shared weights). Used by bench.py,
__graft_entry__.py, and the profiling/export tools so they do not depend on
repo-root files.
"""

from __future__ import annotations


def flagship_m(seed: int = 0, **overrides):
    """Spiking-FullSubNet M (954k params): build(config, params, state, apply)."""
    from .spiking_fullsubnet import build

    args = dict(
        n_fft=512,
        hop_length=128,
        win_length=512,
        fdrc=0.5,
        fb_input_size=64,
        fb_hidden_size=320,
        fb_num_layers=2,
        fb_proj_size=64,
        fb_output_activate_function=False,
        sb_hidden_size=224,
        sb_num_layers=2,
        freq_cutoffs=[0, 32, 128, 256],
        df_orders=[5, 3, 1],
        center_freq_sizes=[4, 32, 64],
        neighbor_freq_sizes=[15, 15, 15],
        use_pre_layer_norm_fb=True,
        use_pre_layer_norm_sb=True,
        bn=True,
        shared_weights=True,
        sequence_model="GSN",
        num_spks=1,
    )
    args.update(overrides)
    return build(seed=seed, **args)
